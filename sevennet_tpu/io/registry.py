"""Pretrained checkpoint registry: name -> path -> URL resolution, download,
and a universal loader.

TPU counterpart of the reference's pretrained-model resolution
(``sevenn/util.py:264-359``, ``sevenn/_const.py:50-68``): the same model
names resolve through a search path of local directories; when a release
URL is known and the file is missing, it is downloaded into the cache with
partial-download cleanup (reference: ``util.download_checkpoint``,
``util.py:224-261``). Without network egress a clean error reports the URL
and the directories searched; drop the ``.pth`` there once and every API
(calculator, CLI, MD engine) picks it up by name.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

__all__ = [
    "resolve_checkpoint",
    "download_checkpoint",
    "get_available_pretrained_models",
    "load_model",
]

_GIT = "https://github.com/MDIL-SNU/SevenNet/releases/download"


class _Entry(NamedTuple):
    basename: str
    url: Optional[str] = None  # official release asset, if one exists
    sha256: Optional[str] = None  # verified after download when known


# canonical name -> entry. Names/URLs mirror the reference's table
# (``_const.py:50-68``). 7net-0 / l3i5 / mf-0 ship inside the reference's
# pip sdist rather than as release assets, so they have no URL; the error
# message points users at the cache directory instead.
_REGISTRY: Dict[str, _Entry] = {
    "sevennet-0": _Entry("checkpoint_sevennet_0.pth"),
    "sevennet-0_11jul2024": _Entry("checkpoint_sevennet_0.pth"),
    "sevennet-0_22may2024": _Entry("checkpoint_sevennet_0_22May2024.pth"),
    "sevennet-l3i5": _Entry("checkpoint_l3i5.pth"),
    "sevennet-mf-0": _Entry("checkpoint_sevennet_mf_0.pth"),
    "sevennet-mf-ompa": _Entry(
        "checkpoint_sevennet_mf_ompa.pth",
        f"{_GIT}/v0.11.0.cp/checkpoint_sevennet_mf_ompa.pth",
    ),
    "sevennet-omat": _Entry(
        "checkpoint_sevennet_omat.pth",
        f"{_GIT}/v0.11.0.cp/checkpoint_sevennet_omat.pth",
    ),
    "sevennet-omni": _Entry(
        "checkpoint_sevennet_omni.pth",
        f"{_GIT}/v0.12.0.cp/checkpoint_sevennet_omni.pth",
    ),
    "sevennet-omni-i8": _Entry(
        "checkpoint_sevennet_omni_i8.pth",
        f"{_GIT}/v0.12.1.cp/checkpoint_sevennet_omni_i8.pth",
    ),
    "sevennet-omni-i12": _Entry(
        "checkpoint_sevennet_omni_i12.pth",
        f"{_GIT}/v0.12.1.cp/checkpoint_sevennet_omni_i12.pth",
    ),
}


def download_checkpoint(path: str, url: str, sha256: Optional[str] = None,
                        timeout: float = 30.0) -> str:
    """Download ``url`` to ``path`` atomically (via ``path + '.partial'``),
    cleaning up the partial file on failure; optionally verify sha256.

    Reference behavior: ``sevenn/util.py:224-261``.
    """
    import urllib.request

    tmp = path + ".partial"
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    try:
        req = urllib.request.Request(
            url, headers={"User-Agent": "sevennet-tpu"})
        with urllib.request.urlopen(req, timeout=timeout) as resp, \
                open(tmp, "wb") as out:
            total = int(resp.headers.get("Content-Length") or 0)
            got = 0
            while True:
                block = resp.read(1 << 20)
                if not block:
                    break
                out.write(block)
                got += len(block)
            if total and got != total:
                raise IOError(
                    f"truncated download: {got} of {total} bytes")
        digest = _file_sha256(tmp)
        if sha256 is not None and digest != sha256:
            raise IOError(
                f"sha256 mismatch for {url}: got {digest}, "
                f"expected {sha256}")
        os.replace(tmp, path)
        if sha256 is None:
            # no pin known: record trust-on-first-use (see _record_sha256)
            _record_sha256(osp.dirname(path) or ".", osp.basename(path),
                           digest)
        return path
    except Exception:
        if osp.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
        raise


def _checksum_files() -> List[str]:
    """Pinned-digest tables, highest priority first: an explicit env-pointed
    file, per-cache-dir TOFU records, then the vendored table next to this
    module."""
    files = []
    env = os.environ.get("SEVENN_TPU_CHECKSUMS")
    if env:
        files.append(env)
    for d in _search_dirs():
        files.append(osp.join(d, "checksums.json"))
    files.append(osp.join(osp.dirname(__file__), "checksums.json"))
    return files


def _pinned_sha256(basename: str) -> Optional[str]:
    import json

    for f in _checksum_files():
        if not osp.exists(f):
            continue
        try:
            with open(f) as fh:
                table = json.load(fh)
        except (OSError, ValueError):
            continue
        if basename in table:
            return str(table[basename])
    return None


def _record_sha256(cache_dir: str, basename: str, digest: str) -> None:
    """Trust-on-first-use: persist the digest of a freshly downloaded
    checkpoint so any later re-download of the same asset must match.

    This image has no network egress, so the registry cannot vendor the
    true digests of the GitHub release assets; TOFU pinning is the honest
    fallback (a corrupted RE-download cannot silently replace a good one),
    and deployments with egress can pin digests up front via
    ``$SEVENN_TPU_CHECKSUMS`` or ``sevennet_tpu/io/checksums.json``.
    """
    import json

    f = osp.join(cache_dir, "checksums.json")
    table = {}
    if osp.exists(f):
        try:
            with open(f) as fh:
                table = json.load(fh)
        except (OSError, ValueError):
            table = {}
    table[basename] = digest
    tmp = f + ".tmp"
    os.makedirs(cache_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    os.replace(tmp, f)


def _file_sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _normalize(name: str) -> Optional[str]:
    n = name.lower().replace("7net", "sevennet")
    if n in _REGISTRY:
        return n
    return None


def _search_dirs() -> List[str]:
    dirs = []
    env = os.environ.get("SEVENN_TPU_CHECKPOINT_DIR")
    if env:
        dirs.append(env)
    dirs.append(osp.expanduser("~/.cache/sevennet_tpu"))
    dirs.append(osp.expanduser("~/.cache/sevennet"))
    return dirs


def get_available_pretrained_models() -> List[str]:
    return sorted(_REGISTRY)


def resolve_checkpoint(name_or_path: str) -> str:
    """Resolve a pretrained model name (or a filesystem path) to a
    checkpoint path. Searches ``$SEVENN_TPU_CHECKPOINT_DIR`` then
    ``~/.cache/sevennet_tpu`` and ``~/.cache/sevennet`` (both flat and one
    subdirectory deep, matching the reference's layout)."""
    if osp.exists(name_or_path):
        return name_or_path
    key = _normalize(name_or_path)
    if key is None:
        raise FileNotFoundError(
            f"'{name_or_path}' is neither an existing path nor a known "
            f"pretrained name; known: {', '.join(get_available_pretrained_models())}"
        )
    base, url, sha = _REGISTRY[key]
    tried = []
    for d in _search_dirs():
        for cand in (osp.join(d, base), osp.join(d, key, base)):
            tried.append(cand)
            if osp.exists(cand):
                return cand
        # reference layout: SevenNet_0__11Jul2024/checkpoint_sevennet_0.pth
        if osp.isdir(d):
            for sub in sorted(os.listdir(d)):
                cand = osp.join(d, sub, base)
                if osp.exists(cand):
                    return cand
    if url is not None:
        dest = osp.join(_search_dirs()[0], base)
        try:
            return download_checkpoint(
                dest, url, sha256=sha if sha is not None
                else _pinned_sha256(base))
        except Exception as e:  # no egress / bad link: fall through to msg
            dl_err = f" (download from {url} failed: {e})"
    else:
        dl_err = " (no release URL exists for this name; it ships inside "\
                 "the reference pip package)"
    raise FileNotFoundError(
        f"pretrained checkpoint '{key}' not found locally{dl_err}; searched "
        + ", ".join(tried)
        + " — place the file in $SEVENN_TPU_CHECKPOINT_DIR or "
        "~/.cache/sevennet_tpu"
    )


def load_model(name_or_path, dtype=None) -> Tuple[Any, Dict[str, Any]]:
    """Universal loader -> (ModelSpec, params).

    Accepts: a pretrained name, a stock SevenNet ``.pth`` checkpoint, a
    native checkpoint directory, or a native ``model.msgpack`` path
    (reference analogue: ``util.model_from_checkpoint``, ``util.py:119-131``).
    """
    path = resolve_checkpoint(str(name_or_path))
    if osp.isdir(path) or path.endswith(".msgpack"):
        from .native_checkpoint import load_checkpoint

        spec, params, _meta = load_checkpoint(path)
        return spec, params
    from .torch_checkpoint import load_sevennet_checkpoint

    return load_sevennet_checkpoint(path, dtype=dtype)

import json
import os

import numpy as np
import pytest

from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.data.extxyz import write_extxyz


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Labels generated from a pair-potential-ish form so training has signal."""
    rng = np.random.default_rng(1)
    frames = []
    for i in range(8):
        n = 6
        cell = np.eye(3) * 6.0
        pos = rng.uniform(0, 6, (n, 3))
        Z = rng.choice([8, 1], n)
        e = float(-1.0 * n + 0.1 * rng.normal())
        frames.append(
            AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True,
                      energy=e, forces=rng.normal(size=(n, 3)) * 0.1,
                      stress=rng.normal(size=6) * 0.001)
        )
    path = tmp_path_factory.mktemp("data") / "train.extxyz"
    write_extxyz(str(path), frames)
    return str(path)


def test_train_loop_decreases_loss(tiny_dataset, tmp_path):
    from sevennet_tpu.scripts.train import train_run

    model_cfg = {
        "cutoff": 4.0,
        "channel": 4,
        "lmax": 1,
        "is_parity": False,
        "num_convolution_layer": 2,
        "chemical_species": "auto",
        "self_connection_type": "linear",
        "conv_denominator": "avg_num_neigh",
        "shift": "per_atom_energy_mean",
        "scale": "force_rms",
    }
    train_cfg = {
        "epoch": 4,
        "loss": "mse",
        "optimizer": "adam",
        "optim_param": {"lr": 0.003},
        "force_loss_weight": 0.1,
        "stress_loss_weight": 1e-4,
        "per_epoch": 2,
        "random_seed": 1,
    }
    data_cfg = {"batch_size": 4, "load_trainset_path": [tiny_dataset], "ratio": 0.25}
    wd = str(tmp_path / "wd")
    trainer = train_run(model_cfg, train_cfg, data_cfg, working_dir=wd)

    lc = open(os.path.join(wd, "lc.csv")).read().strip().splitlines()
    assert len(lc) == 5  # header + 4 epochs
    header = lc[0].split(",")
    i_loss = header.index("train_loss_total")
    first = float(lc[1].split(",")[i_loss])
    last = float(lc[-1].split(",")[i_loss])
    assert last < first, (first, last)
    assert os.path.isdir(os.path.join(wd, "checkpoint_best"))
    assert os.path.isdir(os.path.join(wd, "checkpoint_last"))


def test_native_checkpoint_roundtrip(tmp_path):
    import jax

    from sevennet_tpu.io.native_checkpoint import load_checkpoint, save_checkpoint
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init

    from .conftest import build_graph, compute

    cfg = {"cutoff": 4.0, "channel": 4, "lmax": 2, "is_parity": True,
           "num_convolution_layer": 2, "chemical_species": ["Hf", "O"],
           "conv_denominator": 8.0}
    spec = build_model_spec(cfg)
    params = model_init(jax.random.PRNGKey(0), spec)
    path = str(tmp_path / "cp")
    save_checkpoint(path, cfg, params, epoch=7)

    spec2, params2, meta = load_checkpoint(path)
    assert meta["epoch"] == 7
    assert spec2 == spec

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 6, (8, 3))
    Z = rng.choice([72, 8], 8)
    gb = build_graph(spec, pos, Z, np.eye(3) * 6.0)
    e1 = float(compute(spec, params, gb)["energy"][0])
    e2 = float(compute(spec2, params2, gb)["energy"][0])
    assert abs(e1 - e2) < 1e-6


def test_cli_preset_and_graph_build(tiny_dataset, tmp_path, capsys):
    from sevennet_tpu.cli.main import main

    assert main(["preset", "base"]) == 0
    out = capsys.readouterr().out
    assert "chemical_species" in out and "cutoff" in out

    stats_file = str(tmp_path / "stats.json")
    assert main(["graph_build", tiny_dataset, "--cutoff", "4.0", "--out", stats_file]) == 0
    stats = json.load(open(stats_file))
    assert "avg_num_neigh" in stats and stats["avg_num_neigh"] > 0


def test_optimizer_masks_frozen_params():
    import jax
    import jax.numpy as jnp

    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init
    from sevennet_tpu.train.optim import trainable_mask

    cfg = {"cutoff": 4.0, "channel": 4, "lmax": 1, "num_convolution_layer": 2,
           "chemical_species": ["H", "O"], "conv_denominator": 5.0,
           "train_denominator": False, "train_shift_scale": False}
    spec = build_model_spec(cfg)
    params = model_init(jax.random.PRNGKey(0), spec)
    mask = trainable_mask(spec, params)
    assert mask["rescale_atomic_energy"]["shift"] is False
    assert mask["0_convolution"]["denominator"] is False
    assert mask["0_convolution"]["weight_nn"]["w"][0] is True


def test_loss_config_huber():
    import jax.numpy as jnp

    from sevennet_tpu.train.loss import LossConfig, _criterion

    cfg = LossConfig(criterion="huber", huber_delta=0.5)
    pred = jnp.array([0.0, 1.0])
    ref = jnp.array([0.1, 0.0])
    out = np.asarray(_criterion(cfg, pred, ref))
    assert abs(out[0] - 0.5 * 0.01) < 1e-7  # quadratic region
    assert abs(out[1] - 0.5 * (1.0 - 0.25)) < 1e-7  # linear region


def test_plateau_scheduler_reduces_lr():
    import jax

    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init
    from sevennet_tpu.train import Trainer, TrainerConfig

    cfg = {"cutoff": 4.0, "channel": 4, "lmax": 1, "num_convolution_layer": 2,
           "chemical_species": ["H", "O"], "conv_denominator": 5.0}
    spec = build_model_spec(cfg)
    params = model_init(jax.random.PRNGKey(0), spec)
    trainer = Trainer(
        spec, params,
        TrainerConfig(scheduler="reducelronplateau",
                      scheduler_param={"factor": 0.5, "patience": 1}),
    )
    from optax import tree_utils as otu

    lr0 = trainer.config.lr
    trainer.set_epoch(0)
    assert abs(float(otu.tree_get(trainer.state.opt_state, "step_size")) - lr0) < 1e-12
    trainer.plateau_step(1.0)   # best
    trainer.plateau_step(1.0)   # bad 1
    trainer.plateau_step(1.0)   # bad 2 -> reduce
    trainer.set_epoch(1)
    assert abs(
        float(otu.tree_get(trainer.state.opt_state, "step_size")) - 0.5 * lr0
    ) < 1e-12


def test_epoch_schedule_exponential():
    import jax

    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init
    from sevennet_tpu.train import Trainer, TrainerConfig
    from optax import tree_utils as otu

    cfg = {"cutoff": 4.0, "channel": 4, "lmax": 1, "num_convolution_layer": 2,
           "chemical_species": ["H", "O"], "conv_denominator": 5.0}
    spec = build_model_spec(cfg)
    params = model_init(jax.random.PRNGKey(0), spec)
    trainer = Trainer(
        spec, params,
        TrainerConfig(lr=0.02, scheduler="exponentiallr",
                      scheduler_param={"gamma": 0.5}),
    )
    trainer.set_epoch(3)
    got = float(otu.tree_get(trainer.state.opt_state, "step_size"))
    assert abs(got - 0.02 * 0.5**3) < 1e-12
    # reset_scheduler semantics: shift the schedule origin
    trainer.sched_epoch0 = 3
    trainer.set_epoch(3)
    got = float(otu.tree_get(trainer.state.opt_state, "step_size"))
    assert abs(got - 0.02) < 1e-12


def test_kill_and_resume_reproduces_run(tiny_dataset, tmp_path):
    """Continue restores params+optimizer+epoch: a 2+2-epoch split run must
    equal an uninterrupted 4-epoch run (reference processing_continue.py)."""
    import jax

    from sevennet_tpu.scripts.train import train_run

    model_cfg = {
        "cutoff": 4.0, "channel": 4, "lmax": 1, "is_parity": False,
        "num_convolution_layer": 2, "chemical_species": "auto",
        "conv_denominator": 10.0, "shift": 0.0, "scale": 1.0,
    }
    data_cfg = {"load_trainset_path": [tiny_dataset], "batch_size": 4}
    tcfg = {"epoch": 4, "optimizer": "adam", "optim_param": {"lr": 0.005},
            "scheduler": "exponentiallr", "scheduler_param": {"gamma": 0.5},
            "train_shuffle": False, "per_epoch": 2}

    t_full = train_run(dict(model_cfg), dict(tcfg), dict(data_cfg),
                       working_dir=str(tmp_path / "full"), max_epochs=4)

    t_a = train_run(dict(model_cfg), dict(tcfg), dict(data_cfg),
                    working_dir=str(tmp_path / "half"), max_epochs=2)
    tcfg2 = dict(tcfg)
    tcfg2["continue"] = {"checkpoint": str(tmp_path / "half" / "checkpoint_last")}
    t_b = train_run(dict(model_cfg), tcfg2, dict(data_cfg),
                    working_dir=str(tmp_path / "resumed"), max_epochs=2)

    pf = jax.tree_util.tree_leaves(t_full.state.params)
    pr = jax.tree_util.tree_leaves(t_b.state.params)
    for a, b in zip(pf, pr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unknown_config_key_rejected():
    from sevennet_tpu.config import config_from_dicts

    with pytest.raises(ValueError, match="unknown train config key"):
        config_from_dicts({
            "model": {"cutoff": 4.0, "num_convolution_layer": 2},
            "train": {"opitmizer": "adam"},
            "data": {},
        })


def test_all_presets_parse():
    """Every shipped preset yaml passes the strict config parser (the CLI
    train entry would otherwise reject its own presets)."""
    import yaml

    from sevennet_tpu.cli.main import PRESETS
    from sevennet_tpu.config import config_from_dicts

    assert set(PRESETS) >= {
        "base", "fine_tune", "sevennet-0", "sevennet-l3i5", "multi_modal",
        "mf_0", "mf_ompa_fine_tune", "fine_tune_le",
    }
    for name, text in PRESETS.items():
        model, train, data = config_from_dicts(yaml.safe_load(text))
        assert model["cutoff"] > 0, name


def test_train_fused_matches_dense(tiny_dataset, tmp_path, monkeypatch):
    """Training with the fused Pallas conv (``_conv_fused``, grad-of-grad
    through the kernel's differentiable backward rule) must reproduce the
    dense-XLA path's losses — the accelerator-equivalence contract the
    reference holds for cuEq/FlashTP training (docs accelerator.md)."""
    from sevennet_tpu.scripts.train import train_run

    monkeypatch.setenv("SEVENNET_TPU_TARGET_T", "256")
    import sevennet_tpu.ops.fused_conv as fc

    fc._KERNEL_CACHE.clear()
    model_cfg = {
        "cutoff": 4.0,
        "channel": 4,
        "lmax": 1,
        "is_parity": False,
        "num_convolution_layer": 2,
        "chemical_species": "auto",
        "self_connection_type": "linear",
        "conv_denominator": "avg_num_neigh",
        "shift": "per_atom_energy_mean",
        "scale": "force_rms",
    }
    train_cfg = {
        "epoch": 1,
        "loss": "mse",
        "optimizer": "adam",
        "optim_param": {"lr": 0.0},  # frozen: losses = initial-params losses
        "force_loss_weight": 0.1,
        "stress_loss_weight": 1e-4,
        "per_epoch": 1,
        "random_seed": 1,
        "train_shuffle": False,
    }
    data_cfg = {"batch_size": 4, "load_trainset_path": [tiny_dataset]}

    vals = {}
    for tag, fused in (("dense", False), ("fused", True)):
        cfg = dict(model_cfg, _conv_fused=fused)
        wd = str(tmp_path / tag)
        train_run(cfg, dict(train_cfg), dict(data_cfg), working_dir=wd)
        lc = open(os.path.join(wd, "lc.csv")).read().strip().splitlines()
        header = lc[0].split(",")
        row = lc[1].split(",")
        vals[tag] = {
            h: float(row[i])
            for i, h in enumerate(header)
            if h.startswith("train_") and row[i] not in ("", "nan")
        }
    assert vals["fused"], vals
    for k, v in vals["dense"].items():
        np.testing.assert_allclose(
            vals["fused"][k], v, rtol=2e-3, atol=1e-6, err_msg=k
        )


@pytest.mark.slow
def test_finetune_from_reference_checkpoint(tmp_path, reference_checkpoint_path):
    """VERDICT r3 #7: fine-tune FROM the stock SevenNet ``cp_0.pth``
    (continue semantics: weights + frozen statistics from the checkpoint,
    ``processing_continue.py:16-92``) on a tiny labeled HfO2 set; the
    error-recorder training metrics must decrease."""
    from sevennet_tpu.data.extxyz import write_extxyz
    from sevennet_tpu.scripts.train import train_run

    rng = np.random.default_rng(3)
    frames = []
    for i in range(6):
        n = 8
        cell = np.eye(3) * 5.2
        pos = rng.uniform(0, 5.2, (n, 3))
        Z = rng.choice([72, 8], n)
        frames.append(
            AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True,
                      energy=float(-3.0 * n + 0.05 * rng.normal()),
                      forces=rng.normal(size=(n, 3)) * 0.05)
        )
    path = tmp_path / "hfo2.extxyz"
    write_extxyz(str(path), frames)

    # cutoff must match the checkpoint (a real continue yaml carries the
    # full model section; spec itself is inherited from the checkpoint)
    model_cfg = {"cutoff": 4.0, "chemical_species": ["Hf", "O"]}
    train_cfg = {
        "epoch": 3,
        "loss": "mse",
        "optimizer": "adam",
        "optim_param": {"lr": 0.002},
        "force_loss_weight": 0.1,
        "is_train_stress": False,
        "random_seed": 1,
        "continue": {"checkpoint": reference_checkpoint_path,
                     "reset_epoch": True},
    }
    data_cfg = {"batch_size": 3, "load_trainset_path": [str(path)],
                "ratio": 0.34}
    wd = str(tmp_path / "wd_ft")
    train_run(model_cfg, train_cfg, data_cfg, working_dir=wd)

    lc = open(os.path.join(wd, "lc.csv")).read().strip().splitlines()
    header = lc[0].split(",")
    i_loss = header.index("train_loss_total")
    first = float(lc[1].split(",")[i_loss])
    last = float(lc[-1].split(",")[i_loss])
    assert last < first, (first, last)

"""Re-aggregate an existing trace with full op names."""
import sys, json, gzip, glob, collections
files = glob.glob("/tmp/r3_trace/**/*.trace.json.gz", recursive=True)
steps = 3
agg = collections.Counter()
cnt = collections.Counter()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    pids = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pids.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "")
        agg[name] += ev.get("dur", 0)
        cnt[name] += 1
    print("process names:", set(pids.values()))
tot = sum(agg.values())
print(f"device total {tot/1e3/steps:.1f} ms/step")
for name, dur in agg.most_common(50):
    print(f"{dur/1e3/steps:9.3f} ms/step x{cnt[name]//steps:4d}  {name[:110]}")

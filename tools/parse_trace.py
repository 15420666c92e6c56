"""Aggregate device-op costs from a jax.profiler chrome trace.

Usage: python tools/parse_trace.py [trace_dir=/tmp/jaxtrace]
"""
import collections, glob, gzip, json, sys

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
if not paths:
    sys.exit(f"no trace under {trace_dir}")
with gzip.open(paths[-1], "rt") as f:
    doc = json.load(f)
dur = collections.Counter()
cnt = collections.Counter()
args_of = {}
for e in doc.get("traceEvents", []):
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        if name.startswith(("$", "jit_", "while", "np.")):
            continue  # host-side / region wrappers
        dur[name] += e["dur"]
        cnt[name] += 1
        if name not in args_of and e.get("args"):
            args_of[name] = e["args"]
total = sum(dur.values())
print(f"device total {total/1e6:.2f}s over {sum(cnt.values())} events")
for name, d in dur.most_common(25):
    ln = args_of.get(name, {}).get("long_name", "")[:140]
    print(f"{d/1e6:7.3f}s {cnt[name]:6d}x {name}")
    if ln:
        print(f"         {ln}")

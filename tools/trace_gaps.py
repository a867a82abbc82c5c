"""Inspect device busy vs idle between the 4 traced frames."""
import glob
import sys

import jax

for mode in ("plain", "chunked"):
    path = glob.glob(f"/tmp/trace_{mode}/**/*.xplane.pb", recursive=True)[0]
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(path, "rb").read())
    spans = []
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                if "jit__lambda" in ev.name:
                    spans.append((ev.start_ns, ev.duration_ns))
    spans.sort()
    print(mode, "program executions:")
    prev_end = None
    for s, d in spans:
        gap = (s - prev_end) / 1e6 if prev_end else 0.0
        print(f"  start +{s/1e6:9.3f} ms  dur {d/1e6:7.3f} ms  gap {gap:7.3f} ms")
        prev_end = s + d

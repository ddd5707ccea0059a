"""Host scaling ceiling: what 8 -> 32 parallel efficiency can ANY workload
reach on this box?

Two closed loops, no Spark, no IO, no shared state between processes:

- ``alu``: pure integer multiply-add over a 64 KB (L1/L2-resident) array —
  no DRAM traffic, no LLC pressure beyond 64 KB/proc. Whatever efficiency
  this loses at 32 busy cores is the MACHINE's term (hypervisor scheduling,
  all-core clock behavior, co-tenant pressure) that no library can avoid.
- ``kernel``: the real sketch-update kernel (hash + scatter into a 652 KB
  Count-Min table) over in-RAM tokens.

kernel_eff / alu_eff isolates the library's own contention term from the
host's: a ratio near 1.0 means the kernel adds (almost) no scaling cost on
top of what the hardware imposes on any computation.

Usage: python tools/bench_host_ceiling.py [-> prints a small JSON report]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

ALU = r"""
import numpy as np, time
x = np.arange(8192, dtype=np.uint64)  # 64 KB, L1/L2-resident
m = np.uint64(0x9e3779b97f4a7c15)
for _ in range(200):  # warmup
    x = x * m + np.uint64(1)
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 4.0:
    for _ in range(200):
        x = x * m + np.uint64(1)
    n += 200 * 8192
print(n / (time.perf_counter() - t0))
"""

KERNEL = r"""
import os, sys, time
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, {repo!r})
import numpy as np, math
from sketchlib.countmin import CMConfig, CountMinSketch
cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
rng = np.random.default_rng(7)
toks = rng.integers(0, 2**31, size=4_000_000, dtype=np.int64).astype(np.int32)
cm = CountMinSketch(cfg)
cm.update_batch(toks, preaggregate=False)
t0 = time.perf_counter()
for _ in range(3):
    cm.update_batch(toks, preaggregate=False)
print(12e6 / (time.perf_counter() - t0))
"""


def _aggregate(code: str, n: int) -> float:
    ps = [subprocess.Popen([sys.executable, "-c", code],
                           stdout=subprocess.PIPE) for _ in range(n)]
    return sum(float(p.communicate()[0]) for p in ps)


def main() -> None:
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {}
    for name, code in (("alu", ALU), ("kernel", KERNEL.format(repo=repo))):
        a8 = _aggregate(code, 8)
        time.sleep(2)
        a32 = _aggregate(code, 32)
        out[name] = {"agg_8p": round(a8 / 1e6, 1),
                     "agg_32p": round(a32 / 1e6, 1),
                     "eff_8_32": round(a32 / (4 * a8), 3)}
        time.sleep(2)
    out["kernel_vs_host_ceiling"] = round(
        out["kernel"]["eff_8_32"] / out["alu"]["eff_8_32"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

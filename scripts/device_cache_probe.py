"""Device-cache A/B on hardware: host loader vs device-resident data path.

Two short flagship-config runs (256², b=8) on the structured synthetic
set, measuring steps/s and host-RSS growth per step. Expected: the host
loader leaks ~batch_bytes/step through the tunneled transfer path
(PROFILE.md §8) while the device cache stays flat after upload, and
steps/s improves slightly (no per-step transfer latency).

Usage: python scripts/device_cache_probe.py [steps=300]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsdiff_tpu.train import Trainer  # noqa: E402

import flagship_quality as fq  # noqa: E402


def rss_mb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6


def run(tag, device_cache, steps, data_dir, outdir):
    cfg = fq.build_cfg("ds_diff_gaussian", data_dir, 0.0)
    cfg["device_data_cache"] = device_cache
    tr = Trainer(cfg, Path(outdir) / f"probe_{tag}")
    tr.fit(max_steps=20, log_every=10 ** 9, val_every_epochs=10 ** 9)  # warm
    r0, t0 = rss_mb(), time.time()
    tr.fit(max_steps=20 + steps, log_every=10 ** 9, val_every_epochs=10 ** 9)
    dt, dr = time.time() - t0, rss_mb() - r0
    rec = {"tag": tag, "steps": steps,
           "steps_per_sec": round(steps / dt, 2),
           "rss_growth_mb_per_step": round(dr / steps, 2)}
    print(json.dumps(rec), flush=True)
    tr.ckpt.close()
    return rec


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    outdir = Path("/tmp/dsdiff_dcache_probe")
    outdir.mkdir(parents=True, exist_ok=True)
    data_dir = fq.ensure_data(Path("/tmp/dsdiff_flagship_quality"))
    rows = [run("host_loader", False, steps, data_dir, outdir),
            run("device_cache", True, steps, data_dir, outdir)]
    print(json.dumps({"device_cache_probe": rows}))


if __name__ == "__main__":
    main()

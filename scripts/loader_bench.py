"""Host input-pipeline throughput: can the H5 loader feed the TPU step?

The flagship training step consumes 37-40 slices/s at 256^2 (bench_train).
This measures SliceDataset+BatchLoader batches/s on synthetic 256^2 H5 data
(4 keys/slice, background-prefetch thread) so input starvation shows up as
a number, not a mystery.
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from dsdiff_tpu.data import h5store
from dsdiff_tpu.data.pipeline import BatchLoader, SliceDataset


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tmp = Path(tempfile.mkdtemp(prefix="dsdiff_loader_"))
    rng = np.random.default_rng(0)
    for c in range(4):
        for i in range(32):
            arr = rng.normal(size=(hw, hw)).astype(np.float32)
            h5store.write_slice(
                tmp / f"images_tr_{hw}" / f"case{c}" / f"layer_{i}.h5",
                {"A": arr, "B": arr, "C": arr, "GT": arr},
            )
    ds = SliceDataset(tmp, split=f"images_tr_{hw}",
                      keys=["A", "B", "C", "GT"], pad_to=32, augment=True)
    loader = BatchLoader(ds, batch_size=batch, seed=0, drop_last=True)
    # warm one epoch (thread start + file cache)
    for _ in loader.epoch(0):
        pass
    t0 = time.perf_counter()
    n = 0
    for ep in range(1, 4):
        for b in loader.epoch(ep):
            n += 1
    dt = time.perf_counter() - t0
    print(f"{hw}^2 batch={batch}: {n/dt:7.2f} batches/s = "
          f"{n*batch/dt:8.1f} slices/s (augmented, 4 keys)")


if __name__ == "__main__":
    main()

"""Host image-loader bench: PIL thread pool vs the native C++ loader.

Pure host work — no TPU/tunnel involved, so these numbers transfer to
production hosts directly.  Measures decode + Pillow-exact bilinear
resize + letterbox into uint8 canvases (the ETL's stage-1 cost,
vision/loader.py) over synthetic COCO-sized JPEGs.

    python scripts/bench_host_loader.py [n_images] [threads ...]
"""

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_jpegs(n, tmp):
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        h = int(rng.choice([480, 426, 375, 640, 500]))
        w = int(rng.choice([640, 500, 612, 480]))
        # low-frequency content compresses like a photo, unlike noise
        base = rng.randint(0, 256, (h // 16, w // 16, 3), np.uint8)
        im = Image.fromarray(base).resize((w, h), Image.BILINEAR)
        p = os.path.join(tmp, f"{i:05d}.jpg")
        im.save(p, quality=90)
        paths.append(p)
    return paths


def bench(fn, paths, iters=3):
    fn(paths)                      # warm (page cache etc.)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(paths)
        ts.append(time.perf_counter() - t0)
    return len(paths) / min(ts)


def main():
    from image_caption_tpu.vision import loader

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    threads = [int(t) for t in sys.argv[2:]] or [1, 8, 16, 32]
    tmp = tempfile.mkdtemp(prefix="icx_loader_bench_")
    paths = make_jpegs(n, tmp)
    print(f"{n} synthetic JPEGs (COCO-like sizes), canvas 640, "
          f"native_available={loader.native_available()}")

    for nt in threads:
        pool = ThreadPoolExecutor(nt)
        pil = bench(lambda ps: list(pool.map(
            lambda p: loader.load_letterboxed(p, 640), ps)), paths)
        row = f"threads={nt:3d}  PIL pool {pil:8.1f} img/s"
        if loader.native_available():
            nat = bench(lambda ps: loader.load_letterboxed_batch(
                ps, 640, nthreads=nt), paths)
            row += f"   native {nat:8.1f} img/s   ({nat / pil:.2f}x)"
        print(row)
        pool.shutdown()


if __name__ == "__main__":
    main()

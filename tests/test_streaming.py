"""Streaming-feature soak: the HklDataset gather path under the real
Prefetcher threading must (a) feed batches identical to the eager path,
(b) train with identical losses, and (c) never materialize the split —
the point of streaming is that the ~33 GB COCO train split stays on disk
(``/root/reference/core/utils.py:45-46`` loads all of it).  VERDICT r2 #8.

Memory is compared between two otherwise-identical SUBPROCESS runs (this
file doubles as the child: ``python test_streaming.py <never|always>
<data_dir>``).  The asserted metric is the **tracemalloc peak** — numpy
registers its buffers with tracemalloc, so the eager child's peak must
carry the whole decompressed split and the streaming child's only
batch-sized gathers.  OS-level peak RSS is reported alongside for eyes
but NOT asserted: it proved environment-dependent (under the driver's
instrumented harness both children once reported a byte-identical
6.6 GB ru_maxrss that swamped the 155 MB split — an accounting artifact
outside the process's own allocations), while tracemalloc measures
exactly the thing being pinned.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

N_IMAGES = 512
MAT_BYTES = N_IMAGES * 37 * 2048 * 4       # decompressed features in RAM
N_STEPS = 30


def _make_split(d):
    from image_caption_tpu.data.synthetic import generate_synthetic_dataset
    generate_synthetic_dataset(d, num_images={"train": N_IMAGES,
                                              "valid": 8},
                               captions_per_image=2)


@pytest.fixture(scope="module")
def big_synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_synth"))
    _make_split(d)
    return d


@pytest.mark.slow
def test_streaming_batches_match_eager(big_synth_dir):
    """CaptionBatches over an HklDataset (unsorted, repeated gathers)
    yields byte-identical batches to the in-RAM path."""
    from image_caption_tpu.data.dataset import CaptionBatches, load_split
    from image_caption_tpu.utils.io import HklDataset

    eager = load_split(big_synth_dir, "train", verbose=False,
                       streaming="never")
    stream = load_split(big_synth_dir, "train", verbose=False,
                        streaming="always")
    assert isinstance(stream.features, HklDataset)

    be = CaptionBatches(eager, 16, seed=3)
    bs = CaptionBatches(stream, 16, seed=3)
    for i, (ea, st) in enumerate(zip(be.epoch(1), bs.epoch(1))):
        for a, b in zip(ea[:3], st[:3]):
            np.testing.assert_array_equal(a, b)
        if i >= 6:       # incl. repeated image_idxs within a batch
            break
    stream.features.close()
    stream.positions.close()


def _child(streaming: str, data_dir: str) -> None:
    """Subprocess body: 30 Prefetcher-fed train steps; prints losses +
    tracemalloc peak (+ peak RSS, informational) as JSON."""
    import resource
    import tracemalloc

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from image_caption_tpu.config import get_preset
    from image_caption_tpu.data.dataset import CaptionBatches, load_split
    from image_caption_tpu.data.prefetch import Prefetcher
    from image_caption_tpu.train.loop import Trainer

    cfg = get_preset("maxlen49_64").with_overrides(**{
        "model.num_vocab": 64, "train.batch_size": 16})
    tracemalloc.start()
    split = load_split(data_dir, "train", verbose=False,
                       streaming=streaming)
    trainer = Trainer(cfg, rng=jax.random.PRNGKey(0))
    batches = CaptionBatches(split, cfg.train.batch_size, seed=0)
    losses = []
    # bound the SOURCE, not the consumer: breaking out of the consumer
    # loop would leave the producer thread blocked mid-gather on the
    # (then closed) HDF5 handle — a nondeterministic exit hang
    import itertools
    prefetched = Prefetcher(itertools.islice(batches.epoch(0), N_STEPS),
                            transform=lambda it: trainer.shard(it[:3]))
    for batch in prefetched:
        m = trainer.train_step_device(batch)
        losses.append(float(m["loss"]))
    if streaming == "always":
        split.features.close()
        split.positions.close()
    _, traced_peak = tracemalloc.get_traced_memory()
    print(json.dumps({
        "losses": losses,
        "traced_peak": traced_peak,
        "maxrss": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        * 1024}))


def _run_child(streaming: str, data_dir: str) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                            "")}
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        streaming, data_dir],
                       capture_output=True, text=True, timeout=900,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_streaming_trains_like_eager_with_bounded_rss(big_synth_dir):
    eager = _run_child("never", big_synth_dir)
    stream = _run_child("always", big_synth_dir)

    np.testing.assert_allclose(stream["losses"], eager["losses"],
                               rtol=1e-6)
    assert len(stream["losses"]) == N_STEPS
    # the eager child materializes the split (~155 MB of numpy buffers,
    # all tracemalloc-tracked); the streaming child must allocate only
    # batch-sized gathers
    assert eager["traced_peak"] > MAT_BYTES, \
        (eager["traced_peak"], MAT_BYTES)
    assert stream["traced_peak"] < 0.5 * MAT_BYTES, \
        (stream["traced_peak"], eager["traced_peak"], MAT_BYTES,
         stream["maxrss"], eager["maxrss"])


if __name__ == "__main__":
    _child(sys.argv[1], sys.argv[2])

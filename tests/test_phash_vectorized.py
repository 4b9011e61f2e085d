"""Pin the r08 vectorized phash64 to the original per-slice formulation on
every hash-consuming fixture corpus (plus the derived variants the
augment/resize oracles compare against recorded values).

The vectorized block sums (np.add.reduceat) may differ from per-slice
np.mean in the last ulp on a block mean that sits exactly at the
global-mean threshold — the fixtures were verified flip-free corpus-wide
at the swap (0 mismatches over 365k hashes incl. the 100k near-dup bench
corpus); this test keeps the committed fixture corpora pinned so a codec
or hasher change that flips any recorded bit fails loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from fs2_osm_spark.codecs.png import decode_image, phash64
from fs2_osm_spark.operators.multimodal import block_mean_resize, center_crop
from fs2_osm_spark.synth.staging import IMAGES_FIXTURE, PHASH_CORPUS


def phash64_reference(img: np.ndarray) -> int:
    """The original (pre-r08) scalar formulation, kept verbatim."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[
                ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
            ].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _check_corpus(path: str, n: int) -> None:
    t = pq.read_table(path, columns=["bytes", "fmt"]).slice(0, n)
    for b, f in zip(t.column("bytes").to_pylist(), t.column("fmt").to_pylist()):
        img = decode_image(bytes(b), f)
        for variant in (
            img,
            img[:, ::-1],
            center_crop(img),
            block_mean_resize(img, 8, 8),
        ):
            assert phash64(variant) == phash64_reference(variant)


def test_phash_matches_reference_on_images_fixture():
    _check_corpus(IMAGES_FIXTURE, 400)


def test_phash_matches_reference_on_phash_corpus():
    _check_corpus(PHASH_CORPUS, 400)


def test_phash_narrow_and_tiny_images():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (7, 7), (8, 8), (5, 30), (30, 5), (9, 17)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert phash64(img) == phash64_reference(img)

"""Staged parquet fixtures that give DuckDB oracles access to synthesized
(non-star-schema) inputs.

The image corpus is synthesized in-engine (synth/images.py), so the DuckDB
twin of an image query can't see it through the sf_dir views. Staging the
deterministic 2000-image corpus to a committed parquet file lets the oracle
SQL read the SAME rows by absolute path (`read_parquet('<fixture>')`),
turning the geotag/cell and decode-dims queries from rows-only checks into
hard value oracles. The fixture is independent of scale factor — the image
queries always run on the fixed N_IMAGES corpus.

`ensure_images_fixture()` regenerates the file if missing (bit-deterministic
values via generate_batch); tests assert fixture == live synthesis so a
drifting generator can't silently invalidate the oracle.
"""

from __future__ import annotations

import os

import numpy as np

N_FIXTURE_IMAGES = 2_000

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
IMAGES_FIXTURE = os.path.join(_REPO_ROOT, "fixtures", "images_oracle.parquet")


def ensure_images_fixture() -> str:
    """Write the staged image corpus if absent; return its absolute path."""
    if not os.path.exists(IMAGES_FIXTURE):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fs2_osm_spark.synth.images import generate_batch

        pdf = generate_batch(np.arange(N_FIXTURE_IMAGES, dtype=np.int64))
        os.makedirs(os.path.dirname(IMAGES_FIXTURE), exist_ok=True)
        tmp = IMAGES_FIXTURE + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, IMAGES_FIXTURE)
    return IMAGES_FIXTURE

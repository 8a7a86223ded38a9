"""Adversarial-vector parity fuzz for the embedding/ANN ops.

The sf corpus' embeddings are well-behaved gaussians; the engine-parity
risk is in the edges a real 100-TB embedding column WILL contain: the
all-zero vector (cosine's 0/0), exact duplicates (top-k ties), antipodal
pairs (sim = -1), and extreme magnitudes (float -> double promotion
order). Same protocol as tests/test_curation_fuzz.py: seeded adversarial
table, Spark query vs its own DuckDB oracle, canonicalized compare."""

import duckdb
import numpy as np
import pandas as pd
import pytest

OPS = [
    "ann_cosine_topk", "ann_ivf_probe", "ann_lsh_buckets",
    "dedup_embedding_cosine", "emb_label_centroids",
    "mm_media_meta", "mm_frame_sample", "mm_feature_extract",
]

_DIM = 64


def _adversarial_vecs(seed: int = 11, n: int = 90) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base = rng.normal(size=_DIM).astype("float32")
    for i in range(n):
        kind = i % 6
        if i == 0:
            v = base                                   # the query vector
        elif kind == 1:
            v = np.zeros(_DIM, dtype="float32")        # norm 0 -> 0/0
        elif kind == 2:
            v = base.copy()                            # exact duplicate
        elif kind == 3:
            v = (-base).astype("float32")              # antipodal
        elif kind == 4:
            v = (rng.normal(size=_DIM) * 1e10).astype("float32")
        else:
            v = (rng.normal(size=_DIM) * 1e-10).astype("float32")
        rows.append((i, v.tolist(), int(i % 7)))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzvecs")
    pdf = _adversarial_vecs()
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>, label int"
    ).repartition(3).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_ops_list_is_exhaustive():
    import re

    from findtextcenternet_spark.plans import full_registry

    others = ("region nation customer supplier part orders lineitem "
              "events documents").split()
    expect = sorted(
        name for name, (_fn, sql) in full_registry().items()
        if sql and "embeddings" in sql
        and not any(re.search(rf"\b{t}\b", sql) for t in others))
    assert sorted(OPS) == expect


@pytest.mark.parametrize("name", OPS)
def test_embedding_parity_on_adversarial_vectors(spark, fuzz_dir, name):
    import sys
    sys.path.insert(0, "scripts")
    from check_oracle import canon

    from findtextcenternet_spark.plans import full_registry

    fn, sql = full_registry()[name]
    got = canon(fn(spark, fuzz_dir).toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{fuzz_dir}/embeddings.parquet/*.parquet'")
    want = canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-6)

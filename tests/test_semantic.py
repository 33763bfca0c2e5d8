from __future__ import annotations

import numpy as np
import pytest

from iscc_specs_spark.operators.semantic import featurize_text, semantic_dedup


@pytest.fixture(scope="module")
def planted(spark):
    """10 well-separated unit base vectors; bases 0-2 get 2 extra
    near-copies each (tiny noise, cosine > 0.99) → 3 planted duplicate
    groups of size 3 plus 7 singletons = 16 vectors total."""
    rng = np.random.RandomState(5)
    base = rng.randn(10, 8)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    truth = {}  # vec_id -> planted group (base index)
    vid = 0
    for b in range(10):
        copies = 3 if b < 3 else 1
        for c in range(copies):
            v = base[b] + (0.001 * rng.randn(8) if c else 0.0)
            rows.append((vid, v.tolist()))
            truth[vid] = b
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, truth


def test_semantic_dedup_planted_groups(planted):
    df, truth = planted
    out = semantic_dedup(df, threshold=0.95, k_lists=4, iters=2, dim=8).collect()
    assert len(out) == len(truth)
    by_vec = {r["vec_id"]: r for r in out}
    # planted copies land in one sem_group of size 3; singletons alone
    for b in range(10):
        members = [v for v, g in truth.items() if g == b]
        groups = {by_vec[v]["sem_group"] for v in members}
        assert len(groups) == 1, f"base {b} split across groups"
        size = len(members)
        assert all(by_vec[v]["group_size"] == size for v in members)
    # distinct bases never merge
    assert len({r["sem_group"] for r in out}) == 10


def test_semantic_dedup_one_keep_per_group(planted):
    df, _ = planted
    out = semantic_dedup(df, threshold=0.95, k_lists=4, iters=2, dim=8).collect()
    kept_per_group = {}
    for r in out:
        kept_per_group.setdefault(r["sem_group"], 0)
        kept_per_group[r["sem_group"]] += int(r["keep"])
    assert all(n == 1 for n in kept_per_group.values())
    # the keep-the-novel rule: rep is the group min over (centroid_cos, vec_id)
    groups = {}
    for r in out:
        groups.setdefault(r["sem_group"], []).append(r)
    for members in groups.values():
        want = min(members, key=lambda r: (r["centroid_cos"], r["vec_id"]))
        assert all(r["rep_id"] == want["vec_id"] for r in members)
        assert all(r["keep"] == (r["vec_id"] == want["vec_id"]) for r in members)


def test_semantic_dedup_no_pairs_all_kept(planted):
    df, truth = planted
    # only the 10 distinct bases (first copy of each), threshold above any
    # cross-base cosine
    first_of_base = {}
    for v, g in truth.items():
        first_of_base.setdefault(g, v)
    bases = df.where(df.vec_id.isin(list(first_of_base.values())))
    singles = semantic_dedup(
        df.where(df.vec_id < 1), threshold=0.99, k_lists=1, iters=1, dim=8
    ).collect()
    assert len(singles) == 1 and singles[0]["keep"]
    out = semantic_dedup(bases, threshold=0.999, k_lists=2, iters=2, dim=8)
    rows = out.collect()
    assert all(r["group_size"] == 1 and r["keep"] for r in rows)


def test_semantic_dedup_partition_invariant(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = semantic_dedup(
        emb.repartition(2), threshold=0.4, k_lists=4, iters=2, dim=64
    ).collect()
    b = semantic_dedup(
        emb.repartition(13), threshold=0.4, k_lists=4, iters=2, dim=64
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # decision surface is non-trivial at this threshold on the driver table
    assert any(not r["keep"] for r in a)


def test_semantic_dedup_requires_dim(planted):
    df, _ = planted
    with pytest.raises(ValueError, match="dim"):
        semantic_dedup(df, threshold=0.9)


def test_featurize_text_counts_and_zero_vector(spark):
    docs = spark.createDataFrame(
        [
            ("a", "the cat sat on the mat"),
            ("b", "THE the The"),  # case-folds to one token, count 3
            ("c", ""),  # token-less → zero vector
            ("d", None),  # NULL text → zero vector
        ],
        "url string, text string",
    )
    out = {
        r["url"]: r["embedding"]
        for r in featurize_text(docs, dim=16, hash_fn="xxh64").collect()
    }
    assert set(out) == {"a", "b", "c", "d"}
    assert all(len(v) == 16 for v in out.values())
    # total mass equals token count; identical tokens share one bucket
    assert sum(out["a"]) == 6.0
    assert sum(out["b"]) == 3.0 and max(out["b"]) == 3.0
    assert out["c"] == [0.0] * 16 and out["d"] == [0.0] * 16


def test_featurize_text_md5_matches_duckdb_bucketing(spark):
    """The md5 bucket formula must be byte-identical to the DuckDB twin
    expression (('0x'||substr(md5(tok),1,8))::UBIGINT % dim) used by the
    curation oracle."""
    import duckdb

    toks = ["alpha", "bravo", "charlie", "Δelta", "écho", "123", "x" * 40]
    docs = spark.createDataFrame(
        [(t, t) for t in toks], "url string, text string"
    )
    got = {
        r["url"]: [i for i, v in enumerate(r["embedding"]) if v]
        for r in featurize_text(docs, dim=32, hash_fn="md5").collect()
    }
    con = duckdb.connect()
    for t in toks:
        want = con.execute(
            "SELECT ('0x' || substr(md5(lower($1)), 1, 8))::UBIGINT % 32",
            [t],
        ).fetchone()[0]
        assert got[t] == [want], t


def test_semantic_dedup_zero_vector_is_kept_singleton(spark):
    """A zero vector (what featurize_text emits for a token-less doc) must
    not abort the job — under this repo's ANSI-enabled sessions an
    unguarded 0.0/0.0 cosine throws DIVIDE_BY_ZERO. The _safe_cos guard
    maps its cosines to 0.0, so it survives as a kept singleton that is
    similar-to-nothing."""
    rng = np.random.RandomState(11)
    base = rng.randn(4, 8)
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows += [(4, base[0].tolist())]  # exact copy of vec 0 → one real group
    rows += [(5, [0.0] * 8)]  # the token-less doc
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.95, k_lists=2, iters=2, dim=8
        ).collect()
    }
    assert len(out) == 6
    z = out[5]
    assert z["centroid_cos"] == 0.0
    assert z["group_size"] == 1 and z["keep"] and z["rep_id"] == 5
    assert out[0]["sem_group"] == out[4]["sem_group"]

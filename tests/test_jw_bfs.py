"""Jaro-Winkler differential test vs DuckDB + BFS unit tests."""

from __future__ import annotations

import itertools
import random

import pyarrow as pa
import pytest


def test_jaro_winkler_matches_duckdb_exactly():
    """The oracle compares UNROUNDED jw against the threshold, so the
    Python implementation must be exact-float-equal to DuckDB's — not
    merely close."""
    import duckdb

    from document_ai_ray.functions.strings import jaro_winkler

    rng = random.Random(13)
    words = [
        "martha", "marhta", "dixon", "dicksonx", "abc", "abd",
        "aXXXXX", "aYYYYY", "hello", "hallo", "x", "y", "ab", "ba", "",
        "duplicate", "duplicat", "corpus", "corpse", "transform", "transfrom",
    ]
    words += ["".join(rng.choices("abcdef", k=rng.randint(1, 9))) for _ in range(60)]
    con = duckdb.connect()
    for s1, s2 in itertools.combinations(words, 2):
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)", [s1, s2]).fetchone()[0]
        assert jaro_winkler(s1, s2) == d, (s1, s2)


def test_jaro_winkler_boost_threshold():
    from document_ai_ray.functions.strings import jaro, jaro_winkler

    # below the 0.7 boost threshold the prefix boost must NOT apply
    j = jaro("aXXXXX", "aYYYYY")
    assert j <= 0.7
    assert jaro_winkler("aXXXXX", "aYYYYY") == j
    # above it, it must
    assert jaro_winkler("martha", "marhta") > jaro("martha", "marhta")


@pytest.fixture()
def edges_ds(ray_session):
    import ray.data as rd

    # a -> b -> c -> d, a -> c (shortcut), e isolated dst of d
    t = pa.table(
        {
            "src": pa.array(["a", "b", "c", "a", "d", "c"], pa.string()),
            "dst": pa.array(["b", "c", "d", "c", "e", "d"], pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_bfs_distances(edges_ds):
    from document_ai_ray.stages.links import bfs_host_distance

    out = bfs_host_distance(edges_ds).to_pandas()
    got = dict(zip(out["host"], out["dist"]))
    # seed = min(src) = 'a'; shortest hops: b=1, c=1 (shortcut), d=2, e=3
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_max_hops_cut(edges_ds):
    from document_ai_ray.stages.links import bfs_host_distance

    out = bfs_host_distance(edges_ds, max_hops=2).to_pandas()
    got = dict(zip(out["host"], out["dist"]))
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_explicit_seed(edges_ds):
    from document_ai_ray.stages.links import bfs_host_distance

    out = bfs_host_distance(edges_ds, seed="c").to_pandas()
    got = dict(zip(out["host"], out["dist"]))
    assert got == {"c": 0, "d": 1, "e": 2}


def test_bfs_empty(ray_session):
    import ray.data as rd

    from document_ai_ray.stages.links import bfs_host_distance

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    out = bfs_host_distance(empty).to_pandas()
    assert len(out) == 0

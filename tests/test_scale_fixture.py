"""Pins for the sf1/sf10 synthesis fixture (tools/make_sf1.py), r11.

The embeddings perturbation must be a SIGNED PERMUTATION of the 64
dimensions — an orthogonal transform — so every intra-shard pairwise
cosine (and norm) is preserved exactly while cross-shard vectors are
decorrelated instead of byte-identical (the r10 fixture's exact-replica
artifact made dedup_embed_lsh's sf10 output a shard-squared byproduct).
These tests pin the properties the SWEEP_sf10_embed_r11.log evidence
rests on: if a future edit silently breaks orthogonality or determinism,
the sf10 embed-family proof would be measuring a different corpus.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from make_sf1 import _EMBED_DIM, _embed_expr, _signed_perm  # noqa: E402


def test_shard0_is_identity():
    perm, signs = _signed_perm(0)
    assert perm == list(range(1, _EMBED_DIM + 1))
    assert signs == [1] * _EMBED_DIM


def test_signed_perm_is_valid_and_deterministic():
    seen = set()
    for i in range(1, 100):
        perm, signs = _signed_perm(i)
        assert sorted(perm) == list(range(1, _EMBED_DIM + 1)), f"shard {i}"
        assert set(signs) <= {-1, 1} and len(signs) == _EMBED_DIM
        again = _signed_perm(i)
        assert again == (perm, signs), f"shard {i} not rerun-identical"
        seen.add((tuple(perm), tuple(signs)))
    # decorrelation requires distinct transforms per shard
    assert len(seen) == 99


def test_transform_preserves_cosine_exactly():
    # element negation is exact in float; the permuted product multiset
    # equals the original, so fsum (exact up to one rounding) agrees.
    u = [math.sin(k * 0.7) for k in range(_EMBED_DIM)]
    v = [math.cos(k * 1.3) for k in range(_EMBED_DIM)]
    for i in (1, 7, 42, 99):
        perm, signs = _signed_perm(i)
        tu = [signs[j] * u[perm[j] - 1] for j in range(_EMBED_DIM)]
        tv = [signs[j] * v[perm[j] - 1] for j in range(_EMBED_DIM)]
        dot = math.fsum(a * b for a, b in zip(u, v))
        tdot = math.fsum(a * b for a, b in zip(tu, tv))
        assert abs(dot - tdot) < 1e-12
        assert abs(math.fsum(a * a for a in u) - math.fsum(a * a for a in tu)) < 1e-12


def test_embed_expr_sql_matches_python_transform():
    con = duckdb.connect()
    vec = [float(k + 1) for k in range(_EMBED_DIM)]
    lit = "[" + ", ".join(str(x) for x in vec) + "]"
    for i in (0, 3, 11):
        out = con.execute(
            f"SELECT {_embed_expr(i)} FROM "
            f"(SELECT CAST({lit} AS FLOAT[]) AS embedding)"
        ).fetchone()[0]
        perm, signs = _signed_perm(i)
        expected = [signs[j] * vec[perm[j] - 1] for j in range(_EMBED_DIM)]
        assert out == expected, f"shard {i}"

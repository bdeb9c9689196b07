"""Triangle counting: brute-force equivalence, orientation invariance,
per-node stats, skew (star vs clique) behavior."""

import itertools
import random

from dbt_incremental_ci_spark.operators import triangles


def _brute_triangles(edges):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tris = set()
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tris.add((a, b, c))
    return tris, adj


def test_triangles_vs_brute_force(spark):
    rnd = random.Random(3)
    edges = {(rnd.randint(0, 29), rnd.randint(0, 29)) for _ in range(120)}
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["a"], r["b"], r["c"]) for r in triangles.triangles(df).collect()}
    want, _ = _brute_triangles(edges)
    assert got == want and len(want) > 0


def test_orientation_and_duplicate_invariance(spark):
    # reversed, duplicated, self-loop edges must not change the census
    base = [(1, 2), (2, 3), (1, 3), (3, 4)]
    messy = base + [(2, 1), (3, 1), (4, 4), (1, 2)]
    d1 = spark.createDataFrame(base, ["id_a", "id_b"])
    d2 = spark.createDataFrame(messy, ["id_a", "id_b"])
    t1 = sorted(map(tuple, triangles.triangles(d1).collect()))
    t2 = sorted(map(tuple, triangles.triangles(d2).collect()))
    assert t1 == t2 == [(1, 2, 3)]


def test_node_stats_star_vs_clique(spark):
    # hub star (0-1..0-5): no triangles, lcc 0 at the hub.
    # 4-clique (10,11,12,13): every node has lcc 1.
    star = [(0, i) for i in range(1, 6)]
    clique = [(a, b) for a, b in itertools.combinations([10, 11, 12, 13], 2)]
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 99]], ["doc_id"]
    )
    edges = spark.createDataFrame(star + clique, ["id_a", "id_b"])
    out = {r["node"]: r for r in
           triangles.node_triangle_stats(nodes, edges).collect()}
    assert out[0]["deg"] == 5 and out[0]["tri"] == 0 and out[0]["lcc"] == 0.0
    assert out[10]["deg"] == 3 and out[10]["tri"] == 3 and out[10]["lcc"] == 1.0
    # 4-clique has C(4,3)=4 triangles, each counted once per corner
    total = sum(out[n]["tri"] for n in [10, 11, 12, 13])
    assert total == 3 * 4
    # isolated node present in `nodes` but not in any edge
    assert out[99]["deg"] == 0 and out[99]["tri"] == 0 and out[99]["lcc"] == 0.0


def test_wedges_stay_sqrt_bounded(spark):
    # a 1-to-200 star: naive wedge join from the hub would make
    # C(200,2)=19900 wedges; degree orientation points every leaf at
    # the hub so the hub has out-degree 0 and the census is empty.
    star = [(0, i) for i in range(1, 201)]
    df = spark.createDataFrame(star, ["id_a", "id_b"])
    canon = triangles.canonical_edges(df)
    deg = triangles.degrees(canon)
    oriented = triangles._oriented(canon, deg)
    hub_out = oriented.filter("lo = 0").count()
    assert hub_out == 0
    assert triangles.triangles(df).count() == 0

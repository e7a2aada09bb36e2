"""Ordered funnel (functions/funnel.py) and 4-cycle census
(apps.kclique.cycle4_count)."""

import itertools
import random

import pandas as pd

from ligra_spark.graph import LinkGraph


def test_funnel_strict_ordering(spark):
    from ligra_spark.functions.funnel import funnel_counts

    rows = [
        # u1: full funnel in order
        (1, 1, "2020-01-01 10:00:00", "view"),
        (2, 1, "2020-01-01 10:05:00", "click"),
        (3, 1, "2020-01-01 10:10:00", "purchase"),
        # u2: click BEFORE view, purchase after view but no click after
        (4, 2, "2020-01-01 10:00:00", "click"),
        (5, 2, "2020-01-01 11:00:00", "view"),
        (6, 2, "2020-01-01 12:00:00", "purchase"),
        # u3: view and click at the SAME ts — strict ordering fails
        (7, 3, "2020-01-01 10:00:00", "view"),
        (8, 3, "2020-01-01 10:00:00", "click"),
        # u4: irrelevant events only
        (9, 4, "2020-01-01 10:00:00", "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    )
    got = {
        r["stage"]: (r["step"], r["users"])
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_zero_stage_and_single_step(spark):
    from ligra_spark.functions.funnel import funnel_counts

    ev = spark.createDataFrame(
        [(1, 1, "2020-01-01 10:00:00", "view")],
        "event_id long, user_id long, ts string, event_type string",
    )
    got = {
        r["stage"]: r["users"]
        for r in funnel_counts(ev, ["view", "click"]).collect()
    }
    assert got == {1: 1, 2: 0}  # zero-user stage still reported


def _brute_c4(n, edges):
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cnt = 0
    for quad in itertools.combinations(range(n), 4):
        for perm in [(0, 1, 2, 3), (0, 1, 3, 2), (0, 2, 1, 3)]:
            a, b, c, d = [quad[i] for i in perm]
            if b in adj[a] and c in adj[b] and d in adj[c] and a in adj[d]:
                cnt += 1
    return cnt


def test_cycle4_matches_brute_force(spark):
    from ligra_spark.apps import cycle4_count

    rng = random.Random(3)
    for _ in range(4):
        n = 10
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(20)
                )
                if a != b
            }
        )
        sym = edges + [(b, a) for a, b in edges]
        g = LinkGraph.from_edges(
            spark,
            spark.createDataFrame(sym, "src long, dst long"),
            n=n,
            num_partitions=2,
            symmetric=True,
        )
        assert cycle4_count(g) == _brute_c4(n, edges)


def test_cycle4_square_and_k4(spark):
    from ligra_spark.apps import cycle4_count

    def g_of(edges, n):
        sym = edges + [(b, a) for a, b in edges]
        return LinkGraph.from_edges(
            spark,
            spark.createDataFrame(sym, "src long, dst long"),
            n=n,
            num_partitions=2,
            symmetric=True,
        )

    # plain square: exactly one 4-cycle
    assert cycle4_count(g_of([(0, 1), (1, 2), (2, 3), (0, 3)], 4)) == 1
    # K4: 3 distinct 4-cycles
    assert cycle4_count(g_of(list(itertools.combinations(range(4), 2)), 4)) == 3
    # triangle: none
    assert cycle4_count(g_of([(0, 1), (1, 2), (0, 2)], 3)) == 0


def test_cohort_retention_values(spark):
    import pyspark.sql.functions as F

    from ligra_spark.functions.funnel import cohort_retention

    rows = [
        (1, 1, "2020-01-01 10:00:00"), (2, 1, "2020-01-03 10:00:00"),
        (3, 2, "2020-01-01 23:00:00"), (4, 2, "2020-01-01 23:30:00"),
        (5, 3, "2020-01-02 01:00:00"), (6, 3, "2020-01-03 01:00:00"),
        (7, 3, "2020-01-04 00:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["users"]
        for r in cohort_retention(ev).collect()
    }
    # u1+u2 cohort 01-01 (both day-0 active; only u1 returns on day 2);
    # u3 cohort 01-02 active on offsets 0,1,2; same-day repeats dedupe
    assert got == {
        ("2020-01-01", 0): 2,
        ("2020-01-01", 2): 1,
        ("2020-01-02", 0): 1,
        ("2020-01-02", 1): 1,
        ("2020-01-02", 2): 1,
    }

"""Redirect-chain resolution over a functional edge set — the crawl
operator that turns raw 3xx observations into (url → final landing
url, hop count) facts before frontier admission.

Reference seam: the single-node crawler resolves redirects implicitly
inside its HTTP client (requests follows 3xx chains per fetch;
SURVEY §2.1 S2/J3 treat fetch as a join against observed pages). At
10^10-URL scale redirects arrive as a TABLE — (src_url, dst_url)
rows harvested from fetch responses — and resolving each chain by
iterating per-row would serialize O(chain length) round trips.

Spark restatement: **path doubling** (pointer jumping on a functional
graph). A pointer table ``(node, ptr, hops)`` starts as the edge set
(one step); each iteration self-joins the pointer table on
``ptr == node`` so every surviving pointer doubles its reach —
``ceil(log2(max_hops))`` shuffle joins resolve every chain up to
``max_hops`` links, regardless of chain count. Rows whose pointer has
no outgoing edge are DONE (landed on a terminal url) and stop
advancing — their ``hops`` is the exact chain length, because only
exact step counts are ever added. Rows still pointing at a redirecting
url after the final round are unresolved: a cycle, or a chain longer
than ``max_hops`` — exactly the cases a production crawler refuses to
follow (HTTP clients cap redirects the same way).

Scale shape: each round is one equi-join keyed by the current pointer
(uniform url hashes — no skew pivot), and the pointer table only
SHRINKS (done rows can be set aside via the union-accumulator
variant; kept inline here since the joins are on the same key and AQE
handles the tail). No driver-side state, no per-chain iteration.

Determinism: the edge set must be functional (one outgoing edge per
src — enforced with a guard aggregation that RAISES on violation,
since "pick one" would be order-dependent); given that, every walk is
unique and the output is exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_functional(edges: DataFrame, src_col: str = "src") -> DataFrame:
    """Guard: every ``src`` has exactly one outgoing edge. Violations
    raise (driver-side, after one small aggregation) rather than
    letting a nondeterministic 'first edge wins' leak into results."""
    dup = (
        edges.groupBy(src_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"redirect edge set is not functional: src {dup[0][0]!r} "
            f"has {dup[0]['n']} outgoing edges"
        )
    return edges


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    check_functional: bool = False,
) -> DataFrame:
    """``(src, final, hops, resolved)`` for every src in ``edges``.

    ``resolved=true``: ``final`` is a terminal url (no outgoing edge)
    reached in ``hops`` ≤ ``max_hops`` exact steps. ``resolved=false``:
    the walk was still on a redirecting url after ``max_hops`` steps —
    a cycle or an over-long chain; ``final``/``hops`` then hold the
    pointer state at the last completed doubling round (diagnostic
    only, contractually unspecified — tests pin only the flag).

    ``check_functional=True`` runs :func:`assert_functional` first
    (one extra aggregation job; skip it when the edge set is produced
    by a deterministic upstream groupBy).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    if check_functional:
        assert_functional(edges, src_col)

    # hop targets: after round i the pointer reach is min(2^i, exact
    # chain length); ceil(log2(max_hops)) rounds cover max_hops.
    rounds = max(1, math.ceil(math.log2(max_hops)))

    e = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("ptr")
    )
    p = e.withColumn("hops", F.lit(1).cast("long"))
    # redirecting-url set, reused every round to test "is ptr terminal"
    srcs = e.select(F.col("node").alias("_r")).distinct()

    for _ in range(rounds):
        q = p.select(
            F.col("node").alias("_qn"),
            F.col("ptr").alias("_qp"),
            F.col("hops").alias("_qh"),
        )
        p = (
            p.join(q, p["ptr"] == q["_qn"], "left")
            .select(
                "node",
                F.coalesce("_qp", "ptr").alias("ptr"),
                (
                    F.col("hops")
                    + F.coalesce("_qh", F.lit(0).cast("long"))
                ).alias("hops"),
            )
        )
        # checkpoint-by-localCheckpoint would go here on a real
        # cluster for very deep chains; at max_hops=32 the plan is 5
        # joins deep — well inside Catalyst's comfort zone.

    # 2^rounds may exceed max_hops — a chain longer than the cap can
    # land on a terminal inside the final doubling round, but the
    # contract (like an HTTP client's redirect cap) refuses it.
    ok = F.col("_r").isNull() & (F.col("hops") <= max_hops)
    out = p.join(srcs, p["ptr"] == srcs["_r"], "left").select(
        F.col("node").alias(src_col),
        F.col("ptr").alias("final"),
        F.when(ok, F.col("hops")).otherwise(
            F.lit(None).cast("long")
        ).alias("hops"),
        ok.alias("resolved"),
    )
    return out


def redirect_rewrite(
    frontier: DataFrame,
    rmap: DataFrame,
    url_col: str = "url",
    canon_col: str = "url_canon",
) -> DataFrame:
    """Admission-time rewrite through a RESOLVED redirect map
    (``resolve_redirects`` output, ``(src, final, resolved)``, in
    CANONICAL url space): candidates whose canonical url is not a
    redirect source pass through untouched; resolved sources continue
    under their landing url (``url_col`` replaced by ``final`` — the
    caller re-derives canon/hash/host, since the landing url changes
    all three); unresolved sources (cycles / over-cap chains) DROP,
    exactly as an HTTP client refuses them at fetch time.

    Idempotent by construction: a resolved ``final`` is terminal in
    the redirect graph, hence never itself a source — re-applying the
    rewrite to already-rewritten rows matches nothing. (Retry rows
    re-entering the frontier therefore need no bypass, unlike the
    F1/F1g gates.)

    One equi join keyed by the canonical url on the rows flowing
    through admission; Spark broadcasts the map side when it is small
    (AQE), and at 10^8+ observed redirects the join degrades
    gracefully to a shuffle of the NEW-candidate rows only — the
    rewrite rides frontier entry (seeds + per-wave expansions), never
    the whole standing frontier."""
    m = rmap.select(
        F.col("src").alias("_rd_src"),
        F.col("final").alias("_rd_final"),
        F.col("resolved").alias("_rd_ok"),
    )
    j = frontier.join(m, frontier[canon_col] == F.col("_rd_src"), "left")
    j = j.filter(F.col("_rd_ok").isNull() | F.col("_rd_ok"))
    return j.withColumn(
        url_col,
        F.when(F.col("_rd_ok"), F.col("_rd_final")).otherwise(
            F.col(url_col)
        ),
    ).drop("_rd_src", "_rd_final", "_rd_ok")

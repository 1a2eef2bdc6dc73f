"""Mergeable sketches (extension): count-min over token streams.

A count-min sketch (Cormode & Muthukrishnan 2005) answers frequency
queries in ``depth x width`` counters with one-sided error (estimates
never undercount; overcount <= 2N/width w.h.p.). The property that
matters at 100 TB is MERGEABILITY: cells are plain sums, so the
map-side partial aggregation Spark already does IS the per-partition
sketch build, and the shuffle carries at most ``depth*width`` rows
per partition regardless of corpus size — the sketch is the
aggregation state, not a post-pass.

The hash family is md5-derived (``h_i(x) = int(md5(i:x)[:8]) mod
width``) so an independent engine replays every cell and every
estimate bit-for-bit — same verifiability trade as the sampling and
fingerprint operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_hash(value: Column, row: Column, width: int) -> Column:
    """Bucket of ``value`` in sketch row ``row``: first 8 md5 hex
    chars of ``"{row}:{value}"`` as an integer, mod width. conv() is
    JVM-side; the oracle rebuilds the same fold from hex digits."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), value)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def _coords(df: DataFrame, value_col: str, depth: int, width: int) -> DataFrame:
    """(value, i, h) — each value's coordinate in every sketch row,
    one codegen pass (explode a depth-sequence, hash with the row
    index folded into the md5 input)."""
    return df.select(
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select("__v", "i", cms_hash(F.col("__v"), F.col("i"), width).alias("h"))


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: ``(i, h, cnt)`` cells, one row per non-empty
    counter (<= depth*width rows total). The groupBy partial-
    aggregates map-side, so the exchange carries bounded sketch
    state, not the token stream."""
    return (
        _coords(df, value_col, depth, width)
        .groupBy("i", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_build_weighted(
    counts: DataFrame, value_col: str, weight_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch from a PRE-AGGREGATED ``(value, count)`` table:
    cell(i, h) = sum of counts of the values hashing there — cell-for-
    cell identical to ``cms_build`` over the raw stream, because CMS
    cells are linear in item multiplicity.

    This is the form to prefer at corpus scale: the md5 hashing runs
    once per DISTINCT value per row (|vocab| x depth) instead of once
    per stream element x depth — on a 100 TB token stream with a
    ~10M-type vocabulary that is a ~10^5x cut in hash work, and the
    exchange that builds ``counts`` partial-aggregates map-side
    anyway. Measured 3x faster end-to-end at sf0.1 on the
    heavy-hitters query (3.1s -> 1.0s warm)."""
    w = counts.select(
        F.col(value_col).alias("__v"),
        F.col(weight_col).alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select("__w", "i", cms_hash(F.col("__v"), F.col("i"), width).alias("h"))
    return w.groupBy("i", "h").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    cells: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each query value's frequency: min over the ``depth``
    cells the value hashes to (absent cell = 0). The cell table is
    bounded by depth*width, so it broadcasts against any query set."""
    q = queries.select(F.col(value_col).alias("__q")).distinct()
    qc = _coords(q, "__q", depth, width)
    joined = qc.join(F.broadcast(cells), ["i", "h"], "left").select(
        "__v", F.coalesce(F.col("cnt"), F.lit(0)).alias("__c")
    )
    return (
        joined.groupBy("__v")
        .agg(F.min("__c").alias("cms_est"))
        .select(F.col("__v").alias(value_col), "cms_est")
    )


# --- HyperLogLog (replayable construction) ----------------------------------

HLL_P = 8  #: 2^8 = 256 registers


def hll_alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007, m >= 128)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, value_col: str, p: int = HLL_P) -> DataFrame:
    """Register maxima ``(bucket, rho_max)`` for a value stream.

    Hash = first 15 md5 hex chars (60 bits): top ``p`` bits pick the
    register, the remaining ``60-p`` bits w give rho = (60-p) -
    len(bin(w)) + 1 (leading zeros + 1; w=0 -> 60-p+1). max() is
    idempotent, so duplicates need no pre-distinct, and the register
    table merges across partitions/days by MAX — the max-merge
    counterpart to count-min's sum-merge. Shuffle carries <= 2^p rows
    per partition.
    """
    wbits = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # top p bits via shift, NOT double division: a 60-bit h exceeds
    # double's 53-bit mantissa, so h/2^wbits could floor into the
    # wrong register at exact-multiple boundaries
    bucket = F.shiftrightunsigned(h, wbits)
    w = h % F.lit(2**wbits)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row ``(hll_est)`` from the register table: harmonic-mean
    raw estimate with the small-range linear-counting correction
    (empty registers contribute 2^0)."""
    m = 2**p
    spark = registers.sparkSession
    alpha = hll_alpha(m)
    all_b = spark.range(m).select(F.col("id").alias("bucket"))
    regs = all_b.join(registers, "bucket", "left").select(
        F.coalesce(F.col("rho_max"), F.lit(0)).alias("r")
    )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("z"),
        F.sum((F.col("r") == 0).cast("long")).alias("v"),
    )
    raw = F.lit(alpha * m * m) / F.col("z")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(F.round(est, 2).alias("hll_est"))


# --- KMV (bottom-k) set sketches: cross-corpus overlap ----------------------


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
    assume_distinct: bool = False,
) -> DataFrame:
    """Per-group KMV sketch: the sorted ``k`` smallest md5 hashes of
    the group's DISTINCT values, as ``(group, sketch array)``.

    Bottom-k is taken with a window rank BEFORE any collect — the
    per-group state that moves is k hashes, never the value set
    (the point of KMV at 100 TB: estimate overlap between corpora
    without joining them). Sketches merge by
    bottom-k-of-concatenation, used by ``kmv_pair_jaccard``.

    ``assume_distinct``: callers whose ``(group, value)`` stream is
    already distinct (e.g. the output of an upstream
    ``.distinct()``) skip the dedup exchange here — md5 is injective
    on distinct inputs for all practical purposes, so re-distincting
    the hashed stream would shuffle the corpus a second time for
    nothing."""
    hashed = df.select(
        F.col(group_col).alias("__g"), F.md5(F.col(value_col)).alias("__h")
    )
    if not assume_distinct:
        hashed = hashed.distinct()
    # salted two-round tournament (sampling.bottom_k_per_group), not
    # one window per group: a giant corpus group would otherwise rank
    # its whole distinct-value stream in ONE unsplittable window task;
    # the tournament bounds round 1 at group/64 and round 2 at 64k rows
    from .sampling import bottom_k_per_group

    topk = bottom_k_per_group(
        hashed, ["__g"], [F.col("__h")], k,
        F.pmod(F.xxhash64(F.col("__h")), F.lit(64)),
    )
    return (
        topk.groupBy("__g")
        .agg(F.sort_array(F.collect_list("__h")).alias("sketch"))
        .select(F.col("__g").alias(group_col), "sketch")
    )


def kmv_pair_jaccard(
    sketches: DataFrame, group_col: str, k: int = 32
) -> DataFrame:
    """Estimated Jaccard for every group pair from their KMV sketches
    (Beyer et al. 2007): take the bottom-k of the UNION of the two
    sketches, count how many of those minima belong to both sides —
    that fraction is an unbiased Jaccard estimate. Pure array math on
    the (tiny) sketch table; the corpora themselves are never
    joined."""
    # Pair enumeration WITHOUT a non-equi join: `a.join(b, ga < gb)`
    # compiles to an Inner BroadcastNestedLoopJoin — harmless on a
    # tiny sketch table, but it is exactly the plan shape the repo's
    # hard pin bans (a lost equi-predicate elsewhere would hide behind
    # the allowance). Instead: fold the group NAMES (bounded by the
    # sketch contract — one row per group) into one ordered-pair list,
    # explode it, and attach each side's sketch with a broadcast
    # equi-join. Same output, hash-join-only plan.
    names = sketches.agg(
        F.sort_array(F.collect_set(group_col)).alias("__gs")
    )
    pair_of = F.filter(
        F.flatten(
            F.transform(
                F.col("__gs"),
                lambda x: F.transform(
                    F.col("__gs"),
                    lambda y: F.struct(x.alias("ga"), y.alias("gb")),
                ),
            )
        ),
        lambda p: p.ga < p.gb,
    )
    pairs = (
        names.select(F.explode(pair_of).alias("p"))
        .select("p.ga", "p.gb")
        .join(
            F.broadcast(
                sketches.select(
                    F.col(group_col).alias("ga"), F.col("sketch").alias("sa")
                )
            ),
            "ga",
        )
        .join(
            F.broadcast(
                sketches.select(
                    F.col(group_col).alias("gb"), F.col("sketch").alias("sb")
                )
            ),
            "gb",
        )
    )
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("sa"), F.col("sb")))),
        1,
        k,
    )
    in_both = F.size(
        F.array_intersect(F.array_intersect(union_k, F.col("sa")), F.col("sb"))
    )
    return pairs.select(
        F.col("ga").alias(f"{group_col}_a"),
        F.col("gb").alias(f"{group_col}_b"),
        F.round(in_both / F.size(union_k), 4).alias("kmv_jaccard"),
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *,
    fraction: float = 0.1,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    salt: str = "quant",
) -> DataFrame:
    """Quantile estimation from a deterministic hash sample, with the
    exact quantile and relative error alongside — the mergeable
    cheap-quantiles primitive (any engine with md5 reproduces the
    sample, so estimates are auditable, unlike rng-based sampling).

    At 100 TB the exact side is the expensive one (a full sort-based
    percentile per group); the sampled side reads ``fraction`` of the
    rows. Emitting both here is deliberate: the registered query IS
    the accuracy experiment, and the oracle hash-checks estimate,
    truth, and error together.

    Returns one row per quantile: (q, est, exact, rel_err).
    """
    from .sampling import hash_sample

    sample = hash_sample(df, key_col, fraction, salt=salt)
    est = sample.agg(
        *[
            F.percentile(value_col, F.lit(q)).alias(f"__e{i}")
            for i, q in enumerate(quantiles)
        ]
    )
    exact = df.agg(
        *[
            F.percentile(value_col, F.lit(q)).alias(f"__x{i}")
            for i, q in enumerate(quantiles)
        ]
    )
    # one explode, not a per-quantile unionAll: unioning N selects of
    # the crossJoin would recompute BOTH percentile aggregations N
    # times (each union branch re-reads the corpus)
    both = est.crossJoin(exact)
    packed = F.array(
        *[
            F.struct(
                F.lit(q).cast("double").alias("q"),
                F.col(f"__e{i}").alias("e"),
                F.col(f"__x{i}").alias("x"),
            )
            for i, q in enumerate(quantiles)
        ]
    )
    return both.select(F.explode(packed).alias("r")).select(
        F.col("r.q").alias("q"),
        F.round(F.col("r.e"), 2).alias("est"),
        F.round(F.col("r.x"), 2).alias("exact"),
        # |exact| in the denominator (a negative quantile must not flip
        # the error's sign), NULL when the exact quantile is 0
        F.when(
            F.abs(F.col("r.x")) > 0,
            F.round(
                F.abs(F.col("r.e") - F.col("r.x")) / F.abs(F.col("r.x")), 4
            ),
        ).alias("rel_err"),
    )


# --- Bloom-filter join pruning ----------------------------------------------


def _bloom_positions(key: Column, k: int, m_bits: int, seed: str) -> list[Column]:
    """k md5-derived bit positions for ``key`` (h_i = int(md5('seed'
    i ':' key)[:15hex]) mod m). 15 hex chars < 2^60 keeps the conv()
    result positive in a signed long on any engine."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}{h}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for h in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k: int = 4,
    seed: str = "bf",
) -> DataFrame:
    """Build an ``m_bits``-bit Bloom filter over the distinct values
    of ``keys[key_col]`` as a ``(word, bits)`` table of 32-bit words
    packed in longs (bit index capped at 31 so ``1 << bit`` is
    engine-portable — no sign-bit edge at 63).

    The build is one distributed agg: explode each key to its k bit
    positions, group by word, ``bit_or`` the masks. Map-side partial
    aggregation means the shuffle carries at most ``m_bits/32`` rows
    per partition — the filter is the aggregation state, same
    mergeability story as the count-min sketch above.
    """
    pos = (
        keys.select(F.col(key_col).alias("__k"))
        .distinct()
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col("__k"), k, m_bits, seed))
            ).alias("p")
        )
    )
    return pos.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").alias("bits")
    )


def bloom_prune_stats(
    keys: DataFrame,
    key_col: str,
    probe: DataFrame,
    probe_col: str,
    m_bits: int = 8192,
    k: int = 4,
    seed: str = "bf",
) -> DataFrame:
    """Audit of Bloom-filter semi-join pruning: build the filter from
    ``keys``, probe every DISTINCT value of ``probe[probe_col]`` (the
    pruning question is about values — duplicate fact rows share a
    verdict), and report — in one row — ``(n_keys, n_set_bits,
    n_probed, n_candidates, n_true_matches, n_false_positives)``.
    ``n_false_positives = n_candidates - n_true_matches`` and the
    filter guarantees zero false negatives (asserted by test +
    implied by candidates >= true matches).

    This is the 100 TB pattern behind runtime row-group pruning: ship
    a KB-sized bitset instead of a multi-GB key list to pre-filter a
    fact table before the real join. The probe explodes each row to k
    (word, mask) lookups against the broadcast ``m_bits/32``-row
    filter — map-side only; the exact semi-join used to measure the
    false-positive rate is the thing the filter avoids at scale.
    """
    bloom = bloom_build(keys, key_col, m_bits, k, seed)
    key_set = keys.select(F.col(key_col).alias("__k")).distinct()
    positions = F.array(*_bloom_positions(F.col("__pk"), k, m_bits, seed))
    probed = (
        probe.select(F.col(probe_col).alias("__pk"))
        .distinct()
        .select("__pk", F.explode(positions).alias("p"))
    ).select(
        "__pk",
        (F.col("p") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(p % 32 as int))").alias("mask"),
    )
    # LEFT join: a probe position whose word holds no set bits has no
    # bloom row — that is a MISS (bits=0), not a row to drop; an inner
    # join here would silently shrink np and could promote a miss to a
    # candidate when its other k-1 positions hit
    hits = (
        probed.join(F.broadcast(bloom), "word", "left")
        .select(
            "__pk",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            )
            .cast("int")
            .alias("hit"),
        )
        .groupBy("__pk")
        .agg(F.sum("hit").alias("nh"))
        .withColumn("cand", (F.col("nh") == F.lit(k)).cast("int"))
    )
    truth = hits.join(
        F.broadcast(key_set.withColumn("__true", F.lit(1))),
        hits["__pk"] == key_set["__k"],
        "left",
    ).select("cand", F.coalesce(F.col("__true"), F.lit(0)).alias("t"))
    stats = truth.agg(
        F.count("*").alias("n_probed"),
        F.sum("cand").cast("long").alias("n_candidates"),
        F.sum("t").cast("long").alias("n_true_matches"),
        (F.sum("cand") - F.sum(F.col("cand") * F.col("t")))
        .cast("long")
        .alias("n_false_positives"),
    )
    scalars = key_set.agg(F.count("*").cast("long").alias("n_keys")).crossJoin(
        bloom.agg(
            F.sum(F.bit_count("bits")).cast("long").alias("n_set_bits")
        )
    )
    return scalars.crossJoin(stats).select(
        "n_keys",
        "n_set_bits",
        "n_probed",
        "n_candidates",
        "n_true_matches",
        "n_false_positives",
    )


def sampled_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    *,
    fraction: float = 0.1,
    quantiles: tuple[float, ...] = (0.5, 0.9),
    salt: str = "quant",
) -> DataFrame:
    """Per-GROUP variant of ``sampled_quantiles``: one row per
    (group, q) with the hash-sampled estimate, the exact quantile,
    and the relative error — the per-type latency/value percentile
    report. Both aggregations group once on ``group_col`` (the only
    corpus shuffles); the join back is |groups|-sized and NULL-SAFE,
    so a NULL group (unlabeled events) keeps its quantiles instead of
    silently dropping out of the report (the NULL-group
    join-vs-window lesson).
    """
    from .sampling import hash_sample

    def per_group(src: DataFrame, prefix: str) -> DataFrame:
        return src.groupBy(F.col(group_col).alias(f"__{prefix}g")).agg(
            *[
                F.percentile(value_col, F.lit(q)).alias(f"__{prefix}{i}")
                for i, q in enumerate(quantiles)
            ]
        )

    est = per_group(hash_sample(df, key_col, fraction, salt=salt), "e")
    exact = per_group(df, "x")
    both = est.join(
        exact, F.col("__eg").eqNullSafe(F.col("__xg")), "full_outer"
    )
    packed = F.array(
        *[
            F.struct(
                F.lit(q).cast("double").alias("q"),
                F.col(f"__e{i}").alias("e"),
                F.col(f"__x{i}").alias("x"),
            )
            for i, q in enumerate(quantiles)
        ]
    )
    return both.select(
        F.coalesce(F.col("__eg"), F.col("__xg")).alias(group_col),
        F.explode(packed).alias("r"),
    ).select(
        group_col,
        F.col("r.q").alias("q"),
        F.round(F.col("r.e"), 2).alias("est"),
        F.round(F.col("r.x"), 2).alias("exact"),
        F.when(
            F.abs(F.col("r.x")) > 0,
            F.round(
                F.abs(F.col("r.e") - F.col("r.x")) / F.abs(F.col("r.x")), 4
            ),
        ).alias("rel_err"),
    )

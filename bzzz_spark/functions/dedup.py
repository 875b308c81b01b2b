"""Deduplication operators for training-data pipelines.

Five tiers, cheapest → most general; each returns a DataFrame so it
composes into Spark pipelines, and each (except the embedding path) is
built from md5-based hashing that is bit-identical in Spark, DuckDB and
Python, so correctness is oracle-checkable cross-engine.

Scale notes (the design target is ~10^11 docs):
- exact: one groupBy on a 128-bit hash — one shuffle, no skew (hash keys
  are uniform).
- minhash LSH: signatures are per-doc (narrow); the only shuffle is the
  band-key groupBy; band keys are uniform hashes → no skew.  Pair
  explosion is bounded by bucket sizes; buckets above `max_bucket` are
  dropped (logged) as degenerate (boilerplate) clusters.
- ngram-jaccard: exact verify step — run on LSH candidates at scale,
  or standalone on small corpora.
- simhash: 32-bit signature via per-bit majority vote, one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bzzz_spark.functions.text import normalize_text, shingles


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (normalized) texts.

    Returns (fp, canonical_id, n_dups, ids) for groups with ≥2 members;
    canonical = min id (the keep-this-one policy).
    """
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min over shingles of
    md5(i ':' shingle).  String-min of hex digests is a valid uniform
    minhash and is portable across engines."""
    sh = shingles(text_col, shingle_n)

    def _hasher(i: int):
        # single-argument lambda: a two-parameter lambda would be treated
        # by F.transform as (element, index) and clobber the closure var
        prefix = f"{i}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    sig = F.array(
        *[F.array_min(F.transform(sh, _hasher(i))) for i in range(num_hashes)]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    rows-per-band r = num_hashes/bands; collision prob ≈ 1-(1-s^r)^b for
    Jaccard s.  The bucket self-join is the classic shingle→minhash→
    band→bucket-join pipeline; buckets larger than max_bucket are
    dropped (degenerate boilerplate at web scale).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_rows = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.lit(f"band{bi}:"),
                            F.array_join(F.slice("sig", bi * r + 1, r), "|"),
                        )
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bucket"),
    ).distinct()
    sized = band_rows.withColumn(
        "bsize", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    ).filter(F.col("bsize") <= max_bucket)
    a = sized.select(F.col("bucket"), F.col("id").alias("id_a"))
    b = sized.select(F.col("bucket"), F.col("id").alias("id_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 10000,
) -> DataFrame:
    """Exact Jaccard ≥ threshold over token n-gram shingle sets.

    Inverted self-join on shingles (only pairs sharing ≥1 shingle are
    considered); shingles appearing in > max_shingle_df docs are dropped
    first (stopword-shingle skew guard — the same head-skew discipline
    as the index build).
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("s"))
        .distinct()
    )
    rare = sh.withColumn(
        "sdf", F.count(F.lit(1)).over(Window.partitionBy("s"))
    ).filter(F.col("sdf") <= max_shingle_df).drop("sdf")
    sizes = rare.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = rare.select(F.col("s"), F.col("id").alias("id_a"))
    b = rare.select(F.col("s"), F.col("id").alias("id_b"))
    shared = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """(id, simhash) — per-bit majority vote over token hashes, tf-weighted.

    Token hash = first 8 hex chars of md5 (32 uniform bits), portable
    across engines.  Near-dups = small Hamming distance between
    signatures (see simhash_pairs)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"[\p{L}\p{N}_]+"), 0
                ),
                lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            )
        ).alias("h"),
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes.select("id", sig.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Scale path: band the signature into bits/band_bits chunks — any pair
    within distance d < #bands shares at least one identical band
    (pigeonhole), so the candidate join is an equi-join per band, never
    an all-pairs product."""
    sigs = simhash(df, text_col, id_col, bits)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{bi}:"),
                        (F.shiftright("simhash", bi * band_bits).bitwiseAND(F.lit(mask))).cast("string"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    a = banded.select("band", F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = banded.select("band", F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    pairs = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document repeated n-gram spans — the exact-substring
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (2022), at token-n-gram granularity: a training
    pipeline drops or masks the flagged spans instead of whole docs.

    For every document, finds the token positions covered by at least
    one n-gram occurring in >= min_df DISTINCT documents and merges
    them into maximal [start, end) token spans (0-based, end
    exclusive).  Returns one row per affected doc:
    (id_col, spans: array<struct<start,end>>,
     repeated_token_frac: double, n_tokens: int); clean docs are
    absent.

    Scale shape (~10^11 docs): tokenize + posexplode are narrow; the
    corpus doc-frequency count is ONE groupBy on a uniform md5 gram
    key (no skew); the join back is hash-partitioned on that same key;
    the span merge is a per-doc window.  No pair generation anywhere —
    each n-gram occurrence contributes exactly one row, so total work
    is linear in the corpus token count (a suffix-array construction,
    the paper's single-node shape, does not distribute; this does).
    """
    from bzzz_spark.functions.text import standard_tokenize

    base = df.select(
        F.col(id_col).alias("id"),
        standard_tokenize(F.col(text_col)).alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))
    # positional n-grams: pos is the 0-based token index of gram start.
    # Gram key = xxhash64 (8-byte long), not md5 (32-char hex string):
    # the key rides TWO shuffles (df count + join back), so key width
    # is the dominant shuffle cost at scale — ~5× narrower rows.  A
    # 64-bit collision falsely flags one span pair; expected collisions
    # are (#grams)²/2⁶⁵ ≈ 0.3 at 10⁸ grams and a ~3·10⁻⁷ fraction even
    # at 10¹³ grams — noise against a training pipeline's min_df
    # threshold (the contract oracle groups raw gram STRINGS, so any
    # collision would surface as a CORRECTNESS mismatch).
    grams = base.select(
        "id",
        "n_tokens",
        F.posexplode(
            # docs shorter than n yield no grams (sequence(1, 0) would
            # DESCEND through 0 and crash slice(), so guard explicitly)
            F.when(
                F.col("n_tokens") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - n + 1),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice("toks", i, n), " ")
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("pos", "gram"),
    )
    if min_df == 2:
        # "appears in >= 2 DISTINCT docs" ⟺ min(id) != max(id): ONE
        # partial-aggregatable pass — no per-(gram, id) distinct
        # shuffle ahead of the count (the common case; Lee et al. use
        # exactly this threshold)
        freq = (
            grams.groupBy("gram")
            .agg(F.min("id").alias("_lo"), F.max("id").alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("gram")
        )
    else:
        freq = (
            grams.select("gram", "id")
            .distinct()
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("gram_df"))
            .filter(F.col("gram_df") >= min_df)
            .select("gram")
        )
    flagged = grams.join(freq, "gram").select("id", "n_tokens", "pos")
    # merge overlapping [pos, pos+n) windows per doc: classic island
    # detection, entirely JVM-side (lag-free: a window starts a new
    # island iff it begins past the running max end of its predecessors)
    w = Window.partitionBy("id").orderBy("pos")
    islands = (
        flagged.withColumn(
            "prev_max_end",
            F.max(F.col("pos") + n).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "new_island",
            (
                F.col("prev_max_end").isNull()
                | (F.col("pos") > F.col("prev_max_end"))
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    spans = islands.groupBy("id", "n_tokens", "island").agg(
        F.min("pos").alias("start"),
        F.max(F.col("pos") + n).alias("end"),
    )
    return (
        spans.groupBy("id", "n_tokens")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("start", "end"))
            ).alias("spans"),
            F.sum(F.col("end") - F.col("start")).alias("rep_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            "spans",
            (F.col("rep_tokens") / F.col("n_tokens"))
            .cast("double")
            .alias("repeated_token_frac"),
            "n_tokens",
        )
    )


def strip_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Apply repeated_ngram_spans: every doc comes back with a
    `text_clean` column whose flagged token spans are removed (tokens
    re-joined by single spaces — analyzer-normalized, which is the form
    a training pipeline tokenizes anyway) plus `repeated_token_frac`
    (0.0 for untouched docs).  Docs with no flagged spans pass through
    with text_clean == the token-joined text.

    Output columns `text_clean` and `repeated_token_frac` are reserved:
    an input that already carries either raises (silently overwriting
    caller data would be worse); the helper join uses a collision-safe
    internal name so an input `spans` column passes through intact."""
    from bzzz_spark.functions.text import standard_tokenize

    clash = {"text_clean", "repeated_token_frac"} & set(df.columns)
    if clash:
        raise ValueError(
            f"strip_repeated_spans writes output column(s) {sorted(clash)} "
            "which already exist on the input — rename them first"
        )
    spans = repeated_ngram_spans(df, text_col, id_col, n=n, min_df=min_df)
    joined = df.join(
        spans.select(
            id_col,
            F.col("spans").alias("__bzzz_spans"),
            "repeated_token_frac",
        ),
        id_col,
        "left",
    )
    toks = standard_tokenize(F.col(text_col))
    # keep token i unless some [start, end) span covers it — spans per
    # doc are few (merged maximal islands), so the exists() is cheap
    kept = F.filter(
        toks,
        lambda t, i: ~F.coalesce(
            F.exists(
                F.col("__bzzz_spans"),
                lambda s: (i >= s["start"]) & (i < s["end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.withColumn(
        "text_clean", F.array_join(kept, " ")
    ).withColumn(
        "repeated_token_frac",
        F.coalesce(F.col("repeated_token_frac"), F.lit(0.0)),
    ).drop("__bzzz_spans")


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Training-corpus decontamination against a held-out benchmark /
    evaluation set: the n-gram collision filter used by large-scale LM
    data pipelines (GPT-3 appendix C, PaLM, Llama — typically 8-13
    token grams).

    A training document is contaminated when any of its distinct token
    n-grams also occurs in the benchmark's n-gram set.  Returns one row
    per input doc:

      (doc_id, n_grams, hit_grams, contaminated_frac, contaminated)

    where n_grams counts the doc's DISTINCT n-grams, hit_grams how many
    of those collide with the benchmark, contaminated_frac their ratio
    (0.0 for docs shorter than n tokens), contaminated = hit_grams > 0.

    Scale shape (~10^11 training docs vs ~10^5-10^7 benchmark grams):
    the benchmark gram set is DISTINCT'd and BROADCAST — the corpus
    side is never shuffled for the membership test; the only corpus
    shuffle is the uniform-key doc_id groupBy.  Docs with no grams
    survive via the left join back onto the input ids (a doc too short
    to have an n-gram cannot be contaminated at that n)."""
    bench_grams = (
        benchmark.select(
            F.explode(shingles(bench_text_col, n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(text_col, n)).alias("gram"),
    )
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__bzzz_hit", F.lit(1))),
        "gram",
        "left",
    )
    agg = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("__bzzz_hit"), F.lit(0)).alias("hit_grams"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("hit_grams"), F.lit(0)).alias("hit_grams"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                    F.col("hit_grams").cast("double") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contaminated_frac"),
            (F.coalesce(F.col("hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list — the cluster-
    resolution stage that turns near-dup PAIRS (minhash_lsh_pairs /
    ngram_jaccard_pairs / simhash_pairs output) into duplicate CLUSTERS.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): O(log n) rounds to a
    fixpoint where every node points at its component's minimum id.
    Returns (id, component) with one row per node appearing in `edges`;
    component = min node id in that node's component.  Ids may be any
    orderable type (long, string).

    Scale shape (~10^9 edge candidate graphs):
    - Each round is two groupBy-min + broadcast-free equi-joins on the
      node id — uniform hash keys, no skew beyond the graph's own
      star-shape, which is exactly what large-star splits.
    - NO collect_set / per-node adjacency arrays: a web-scale boilerplate
      cluster (one bucket with 10^6 members) stays as rows, never as a
      single giant array in one task.
    - Lineage is cut every round with localCheckpoint (an iterative
      DataFrame loop otherwise accumulates an exponentially growing
      plan); on a real cluster prefer a reliable checkpoint dir.
    - Convergence needs one small action per round (count + empty-diff
      probe) — O(log n) actions total; dedup graphs from banded LSH are
      near-cliques, so 2-4 rounds in practice.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # every id mentioned in `edges` is a node — including ids that only
    # appear in self-loops (they form their own component)
    nodes = (
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = raw.filter(F.col("u") != F.col("v")).distinct()
    e = e.localCheckpoint(eager=True)
    n_prev = e.count()

    def _unchanged(new, new_count, old, old_count):
        # distinct sets: equal counts + one-way empty diff ⇒ set equality
        return (
            new_count == old_count
            and new.subtract(old).limit(1).count() == 0
        )

    for _ in range(max_iter):
        # -- large-star: every neighbor v > u re-points at
        #    m = min(Γ(u) ∪ {u}); splits high-degree stars.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = sym.groupBy("u").agg(F.min("v").alias("mv"))
        lmin = lmin.select("u", F.least("u", "mv").alias("m"))
        e_big = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_big = e_big.count()
        # -- small-star: orient edges large→small, re-point every small
        #    neighbor (and u itself) at the minimum.
        oriented = e_big.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        smin = oriented.groupBy("u").agg(F.min("v").alias("mv"))
        e_new = (
            oriented.join(smin, "u")
            .filter(F.col("v") != F.col("mv"))
            .select(F.col("v").alias("u"), F.col("mv").alias("v"))
            .union(smin.select(F.col("u"), F.col("mv").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = e_new.count()
        # converged only when BOTH star ops left the edge set unchanged
        # this round (small-star alone has non-star fixpoints, e.g.
        # chains — Kiveris et al. §3 requires the joint fixpoint).
        if _unchanged(e_big, n_big, e, n_prev) and _unchanged(
            e_new, n_new, e_big, n_big
        ):
            e = e_new
            break
        e, n_prev = e_new, n_new
    # At fixpoint e is a star: (node → component min).  groupBy-min makes
    # the result deterministic even if max_iter stopped us early; roots
    # (component minima) don't appear as src, so left-join them back.
    assign = e.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.join(
        assign, nodes["id"] == assign["u"], "left"
    ).select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    include_singletons: bool = True,
) -> DataFrame:
    """Assign every doc a duplicate-cluster id given near-dup pairs.

    Returns (doc_id, cluster_id): docs connected through `pairs` share
    the component's min doc id; docs in no pair are their own cluster
    (dropped when include_singletons=False).  The pairs graph is tiny
    relative to the corpus (only near-dups), so the join back onto the
    corpus broadcasts in the common case and hash-joins otherwise.
    """
    comp = connected_components(pairs, src=src, dst=dst).select(
        F.col("id").alias("__bzzz_cc_id"),
        F.col("component").alias("__bzzz_cc_comp"),
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(
        comp, F.col("doc_id") == F.col("__bzzz_cc_id"), "left"
    )
    if not include_singletons:
        out = out.filter(F.col("__bzzz_cc_comp").isNotNull())
    return out.select(
        "doc_id",
        F.coalesce("__bzzz_cc_comp", F.col("doc_id")).alias("cluster_id"),
    )


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    prefer_col: str | None = None,
) -> DataFrame:
    """Filter a corpus to ONE representative doc per duplicate cluster.

    The end-to-end dedup step a training pipeline actually runs:
    pairs (from any of the pair generators) → connected components →
    keep the best doc per cluster, where "best" is max `prefer_col`
    (e.g. a quality score) with min doc_id as the deterministic
    tie-break, or simply min doc_id when prefer_col is None.  Docs in
    no cluster always survive.  Returns df's schema unchanged.

    One window over cluster_id (uniform keys — cluster ids are doc
    ids); no giant-cluster skew beyond what max_bucket already capped
    at pair generation.
    """
    clusters = dedup_clusters(df, pairs, id_col=id_col, src=src, dst=dst)
    joined = df.join(
        clusters.select(
            F.col("doc_id").alias("__bzzz_kc_id"),
            F.col("cluster_id").alias("__bzzz_kc_cluster"),
        ),
        F.col(id_col) == F.col("__bzzz_kc_id"),
    )
    order = (
        [F.col(prefer_col).desc()] if prefer_col is not None else []
    ) + [F.col(id_col).asc()]
    w = Window.partitionBy("__bzzz_kc_cluster").orderBy(*order)
    return (
        joined.withColumn("__bzzz_kc_rn", F.row_number().over(w))
        .filter(F.col("__bzzz_kc_rn") == 1)
        .drop("__bzzz_kc_id", "__bzzz_kc_cluster", "__bzzz_kc_rn")
    )

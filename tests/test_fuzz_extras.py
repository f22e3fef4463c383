"""Differential fuzzing of the extras text-signal expression layer:
seeded adversarial corpora (empty / whitespace runs / punct / digits /
repeated phrases / metachars / NULL) through the Spark kernels of
extras.text / extras.dedup vs hand-written DuckDB SQL twins — the same
twins the driver oracles use, here exercised on nastier text than the
fixture documents.  Runs under both ANSI modes (conftest ansi_mode).
"""

import os
import random

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import dedup as dd
from pydiverse_transform_spark.extras import text as tx

from oracle_util import compare

pytestmark = pytest.mark.usefixtures("ansi_both")

# DuckDB twins (identical to the driver-oracle fragments in
# __spark_entry__.py — single point of truth for the regexes)
TOKENS = ("string_split_regex("
          "regexp_replace({col}, '^\\s+|\\s+$', '', 'g'), '\\s+')")
LTOKENS = TOKENS.format(col="lower({col})")


def _tok_count(col):
    return (f"CASE WHEN length(regexp_replace({col}, '^\\s+|\\s+$', '', "
            f"'g')) = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(len({TOKENS.format(col=col)}) AS BIGINT) END")


def _ratio(kept, total):
    return (f"CASE WHEN {total} = 0 THEN 0.0 "
            f"ELSE ({total} - {kept}) * 1.0 / {total} END")


def _shingles_all(col, k):
    words = TOKENS.format(col=f"lower({col})")
    return (f"list_transform(range(0, greatest(len({words}) - {k}, 0) + 1),"
            f" j -> array_to_string(({words})[j + 1: j + {k}], ' '))")


def _word_shingles(col, k):
    guarded = "coalesce(" + col + ", '')"
    return "list_sort(list_distinct(" + _shingles_all(guarded, k) + "))"


def _char_shingles(col, k):
    t = f"lower(regexp_replace(coalesce({col}, ''), '\\s+', ' ', 'g'))"
    return (f"list_sort(list_distinct(list_transform("
            f"range(1, greatest(length({t}) - {k} + 1, 1) + 1), "
            f"j -> substr({t}, j, {k}))))")


def _segments(col, s):
    words = TOKENS.format(col=f"coalesce({col}, '')")
    n_seg = f"CAST(ceil(len({words}) * 1.0 / {s}) AS INT)"
    return (f"CASE WHEN {n_seg} < 1 THEN CAST([] AS VARCHAR[]) ELSE "
            f"list_transform(range(1, greatest({n_seg}, 1) + 1), "
            f"i -> array_to_string(({words})[(i - 1) * {s} + 1: i * {s}],"
            f" ' ')) END")


def _toks_guard(col, lower=False):
    inner = f"lower({col})" if lower else col
    trimmed = f"regexp_replace({inner}, '^\\s+|\\s+$', '', 'g')"
    return (f"CASE WHEN length({trimmed}) = 0 THEN CAST([] AS VARCHAR[]) "
            f"ELSE string_split_regex({trimmed}, '\\s+') END")


def _mean_word_len(col):
    toks = _toks_guard(col)
    return (f"round(CASE WHEN len({toks}) = 0 THEN 0.0 "
            f"ELSE list_aggregate(list_transform({toks}, w -> length(w)), "
            f"'sum') * 1.0 / len({toks}) END, 6)")


def _symbol_word_ratio(col):
    toks = _toks_guard(col)
    return (f"round(CASE WHEN len({toks}) = 0 THEN 0.0 "
            f"ELSE ((length({col}) - length(replace({col}, '#', ''))) "
            f"+ (length({col}) - length(replace({col}, '...', ''))) / 3.0) "
            f"/ len({toks}) END, 6)")


def _line_ratio(col, line_pred):
    lines = f"string_split({col}, chr(10))"
    return (f"round(CASE WHEN len({lines}) = 0 THEN 0.0 "
            f"ELSE len(list_filter({lines}, l -> {line_pred})) "
            f"* 1.0 / len({lines}) END, 6)")


def _alpha_word_ratio(col):
    toks = _toks_guard(col)
    return (f"round(CASE WHEN len({toks}) = 0 THEN 0.0 "
            f"ELSE len(list_filter({toks}, "
            f"w -> regexp_matches(w, '[A-Za-z]'))) "
            f"* 1.0 / len({toks}) END, 6)")


def _required_words(col):
    ltoks = _toks_guard(col, lower=True)
    terms = " + ".join(f"list_contains({ltoks}, '{w}')::INT"
                       for w in tx.GOPHER_REQUIRED_WORDS)
    return f"CAST({terms} AS BIGINT)"


def _stopwords(col):
    inlist = ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"])
    toks = LTOKENS.format(col=col)
    return (f"CASE WHEN length(regexp_replace({col}, '^\\s+|\\s+$', '', "
            f"'g')) = 0 THEN CAST(0 AS BIGINT) ELSE CAST("
            f"len(list_filter({toks}, w -> w IN ({inlist}))) AS BIGINT) END")


# each op: (name, spark expr fn, duckdb select expr over column `t`)
def _ops(rng):
    k = rng.choice([2, 3, 4])
    ck = rng.choice([3, 4, 5])
    s = rng.choice([2, 3, 5])
    bpe = tx.BPE_PRETOKEN_PATTERN.replace("'", "''")
    return [
        ("token_count", lambda c: tx.token_count(c), _tok_count("t")),
        ("punct_ratio", lambda c: tx.punct_ratio(c),
         _ratio("length(regexp_replace(t, '[[:punct:]]', '', 'g'))",
                "length(t)")),
        ("digit_ratio", lambda c: tx.digit_ratio(c),
         _ratio("length(regexp_replace(t, '[0-9]', '', 'g'))", "length(t)")),
        ("whitespace_ratio", lambda c: tx.whitespace_ratio(c),
         _ratio("length(regexp_replace(t, '\\s', '', 'g'))", "length(t)")),
        ("stopword_count", lambda c: tx.stopword_count(c), _stopwords("t")),
        (f"repetition_ratio_k{k}",
         lambda c: F.round(tx.repetition_ratio(c, k), 6),
         "round(1.0 - CAST(len(list_distinct("
         + _shingles_all("coalesce(t, '')", k)
         + ")) AS DOUBLE) / len("
         + _shingles_all("coalesce(t, '')", k) + "), 6)"),
        (f"word_shingles_k{k}",
         lambda c: F.array_sort(dd.word_shingles(c, k)),
         _word_shingles("t", k)),
        (f"char_shingles_k{ck}",
         lambda c: F.array_sort(dd.char_shingles(c, ck)),
         _char_shingles("t", ck)),
        (f"segment_words_s{s}", lambda c: tx.segment_words(c, s),
         _segments("t", s)),
        ("bpe_token_count", lambda c: tx.bpe_token_count(c),
         f"CAST(length(regexp_extract_all(t, '{bpe}')) AS BIGINT)"),
        ("mean_word_length",
         lambda c: F.round(tx.mean_word_length(c), 6), _mean_word_len("t")),
        ("symbol_word_ratio",
         lambda c: F.round(tx.symbol_word_ratio(c), 6),
         _symbol_word_ratio("t")),
        ("bullet_line_ratio",
         lambda c: F.round(tx.bullet_line_ratio(c), 6),
         _line_ratio("t", "regexp_matches(regexp_replace(l, '^\\s+', ''),"
                          " '^[-*]')")),
        ("ellipsis_line_ratio",
         lambda c: F.round(tx.ellipsis_line_ratio(c), 6),
         _line_ratio("t", "regexp_matches(regexp_replace(l, '\\s+$', ''),"
                          " '\\.\\.\\.$')")),
        ("alpha_word_ratio",
         lambda c: F.round(tx.alpha_word_ratio(c), 6),
         _alpha_word_ratio("t")),
        ("required_word_count",
         lambda c: tx.required_word_count(c), _required_words("t")),
    ]


WORDS = ["the", "and", "cat", "Dog", "data", "X9", "a", "of", "in",
         "spark", "query", "it", "is"]
NOISE = [".", ",", "!!", "??", "--", "(x)", "[y]", "a.b*c", "x'y",
         "1234", "007", "3.14", "$%&", "::",
         # drive the gopher-rule paths: symbols, ellipses, bullet lines
         "#", "##tag", "...", "wait...", "\n- item", "\n* item", "\n-",
         "end...\n"]
WS = [" ", "  ", "\t", "\n", " \n ", "\t\t"]


def _make_text(rng):
    shape = rng.random()
    if shape < 0.06:
        return rng.choice(["", " ", "\t", "\n \t", None])
    n = rng.randint(1, 30)
    parts = []
    phrase = None
    for _ in range(n):
        p = rng.random()
        if p < 0.55:
            parts.append(rng.choice(WORDS))
        elif p < 0.75:
            parts.append(rng.choice(NOISE))
        elif p < 0.9 and parts:
            # repeated phrase: drives repetition/shingle dedup paths
            phrase = phrase or " ".join(parts[-min(3, len(parts)):])
            parts.append(phrase)
        else:
            parts.append(rng.choice(WORDS) + rng.choice(NOISE))
    sep = rng.choice(WS)
    return sep.join(parts)


SEED_BASE = int(os.environ.get("FUZZ_SEED_BASE", "0"))
N_ROUNDS = 3
N_TEXTS = 40


def test_fuzz_extras_text_ops(spark):
    failures = []
    n_checked = 0
    for rnd in range(N_ROUNDS):
        rng = random.Random(SEED_BASE + 1000 + rnd)
        texts = [_make_text(rng) for _ in range(N_TEXTS)]
        data = {"id": list(range(len(texts))), "t": texts}
        sdf = spark.createDataFrame(
            list(zip(data["id"], data["t"])), "id long, t string")
        con = duckdb.connect()
        con.register("corpus", pa.table(data))
        for name, sfn, sql_expr in _ops(rng):
            out = sdf.select("id", sfn(F.col("t")).alias("v")).orderBy("id")
            sql = f"SELECT id, {sql_expr} AS v FROM corpus ORDER BY id"
            ok, msg = compare(out, con, sql, f"extras[{rnd}:{name}]")
            n_checked += 1
            if not ok:
                failures.append(msg)
        con.close()
    assert n_checked >= 3 * 10
    assert not failures, f"{len(failures)} mismatches:\n" + "\n".join(
        failures[:5])


# --------------------------------------------------------------------------
# sampling gates: filter_by_quantile (exact) and take_token_budget vs
# DuckDB twins on random tables with ties, NULL scores and NULL groups
# --------------------------------------------------------------------------

def test_fuzz_sampling_gates(spark):
    from pydiverse_transform_spark.extras import sampling as sp

    failures = []
    n_checked = 0
    for rnd in range(4):
        rng = random.Random(7000 + rnd)
        n = rng.randint(8, 60)
        rows = []
        for i in range(n):
            g = rng.choice(["a", "b", "c", None])
            score = rng.choice(
                [None, float(rng.randint(0, 5)),  # heavy ties
                 rng.random() * 100]
            )
            toks = rng.choice([None, rng.randint(1, 50)])
            rows.append((i, g, score, toks))
        sdf = spark.createDataFrame(
            rows, "id long, g string, score double, toks int")
        con = duckdb.connect()
        con.register("tbl", pa.table({
            "id": [r[0] for r in rows],
            "g": [r[1] for r in rows],
            "score": [r[2] for r in rows],
            "toks": pa.array([r[3] for r in rows], type=pa.int32()),
        }))

        q = rng.choice([0.0, 0.25, 0.5, 0.8, 1.0])
        out = sp.filter_by_quantile(
            sdf, "score", q, partition_by=["g"], exact=True
        ).orderBy("id")
        sql = f"""
            SELECT id, g, score, toks FROM (
              SELECT *, min(CASE WHEN cd >= {q} THEN score END)
                          OVER (PARTITION BY g) AS thr
              FROM (SELECT *, cume_dist() OVER (PARTITION BY g
                                                ORDER BY score) AS cd
                    FROM tbl WHERE score IS NOT NULL))
            WHERE score >= thr ORDER BY id"""
        ok, msg = compare(out, con, sql, f"quantile[{rnd}:q={q}]")
        n_checked += 1
        if not ok:
            failures.append(msg)

        budget = rng.choice([1, 25, 80])
        out = sp.take_token_budget(
            sdf, "toks", budget, order_by="id", partition_by=["g"]
        ).orderBy("id")
        sql = f"""
            SELECT id, g, score, toks FROM (
              SELECT *, sum(toks) OVER (PARTITION BY g ORDER BY id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM tbl)
            WHERE cum - toks < {budget} ORDER BY id"""
        ok, msg = compare(out, con, sql, f"budget[{rnd}:b={budget}]")
        n_checked += 1
        if not ok:
            failures.append(msg)
        con.close()
    assert n_checked == 8
    assert not failures, "\n".join(failures[:5])


# --------------------------------------------------------------------------
# importance module (r6): DSIR weights, Gumbel top-k, temperature mix vs
# DuckDB twins on random corpora with NULL/empty/adversarial text
# --------------------------------------------------------------------------

def test_fuzz_importance_gates(spark):
    from pydiverse_transform_spark.extras import importance as imp

    words = ["alpha", "beta", "Gamma", "δδ", "x", "..", "1", "the"]
    failures = []
    for rnd in range(3):
        rng = random.Random(8100 + rnd)
        n = rng.randint(10, 40)
        rows = []
        for i in range(n):
            t = rng.choice([
                None, "", "   ",
                " ".join(rng.choices(words, k=rng.randint(1, 12))),
            ])
            g = rng.choice(["s1", "s2", "s3"])
            rows.append((i, g, t))
        sdf = spark.createDataFrame(rows, "id long, g string, text string")
        con = duckdb.connect()
        con.register("tbl", pa.table({
            "id": [r[0] for r in rows],
            "g": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }))
        nb = 128

        # --- DSIR weight vs full SQL replay (target = group s1) -------
        t_counts = imp.bucket_counts(
            sdf.filter(F.col("g") == "s1"), "text", n_buckets=nb)
        r_counts = imp.bucket_counts(sdf, "text", n_buckets=nb)
        lut = imp.log_ratio_table(t_counts, r_counts)
        out = sdf.select(
            "id",
            F.round(imp.importance_weight(F.col("text"), lut), 6)
            .alias("w"),
        ).orderBy("id")
        toks = ("string_split_regex(lower(regexp_replace("
                "coalesce(text, ''), '^\\s+|\\s+$', '', 'g')), '\\s+')")
        sql = f"""
            WITH toksd AS (SELECT id, g, {toks} AS t FROM tbl),
            grams AS (
              SELECT id, g, unnest(t) AS gr FROM toksd
              UNION ALL
              SELECT id, g, unnest(list_transform(t[1:len(t)-1],
                     (w, i) -> w || ' ' || t[i+1])) AS gr FROM toksd
            ), bucketed AS (
              SELECT id, g,
                     ('0x' || substr(md5(gr), 1, 8))::BIGINT % {nb} AS b
              FROM grams
            ), tcnt AS (
              SELECT b, count(*) AS n FROM bucketed WHERE g = 's1'
              GROUP BY b
            ), rcnt AS (
              SELECT b, count(*) AS n FROM bucketed GROUP BY b
            ), tot AS (
              SELECT (SELECT count(*) FROM bucketed WHERE g = 's1') AS tn,
                     (SELECT count(*) FROM bucketed) AS rn
            ), lut AS (
              SELECT r.b,
                     ln((coalesce(t.n, 0) + 1.0) / (tot.tn + {nb}))
                     - ln((r.n + 1.0) / (tot.rn + {nb})) AS lr
              FROM rcnt r LEFT JOIN tcnt t USING (b), tot
            ), wts AS (
              SELECT id, sum(lr) AS w FROM bucketed JOIN lut USING (b)
              GROUP BY id
            )
            SELECT tbl.id, round(coalesce(wts.w, 0.0), 6) AS w
            FROM tbl LEFT JOIN wts USING (id) ORDER BY id"""
        ok, msg = compare(out, con, sql, f"dsir[{rnd}]")
        if not ok:
            failures.append(msg)

        # --- gumbel top-k on those weights ----------------------------
        k = rng.choice([3, 7])
        wdf = sdf.select(
            "id", imp.importance_weight(F.col("text"), lut).alias("w"))
        kept = imp.gumbel_topk(wdf, "w", k, "id", salt="fz") \
            .select("id").orderBy("id")
        sql = f"""
            WITH toksd AS (SELECT id, g, {toks} AS t FROM tbl),
            grams AS (
              SELECT id, g, unnest(t) AS gr FROM toksd
              UNION ALL
              SELECT id, g, unnest(list_transform(t[1:len(t)-1],
                     (w, i) -> w || ' ' || t[i+1])) AS gr FROM toksd
            ), bucketed AS (
              SELECT id, g,
                     ('0x' || substr(md5(gr), 1, 8))::BIGINT % {nb} AS b
              FROM grams
            ), tcnt AS (
              SELECT b, count(*) AS n FROM bucketed WHERE g = 's1'
              GROUP BY b
            ), rcnt AS (
              SELECT b, count(*) AS n FROM bucketed GROUP BY b
            ), tot AS (
              SELECT (SELECT count(*) FROM bucketed WHERE g = 's1') AS tn,
                     (SELECT count(*) FROM bucketed) AS rn
            ), lut AS (
              SELECT r.b,
                     ln((coalesce(t.n, 0) + 1.0) / (tot.tn + {nb}))
                     - ln((r.n + 1.0) / (tot.rn + {nb})) AS lr
              FROM rcnt r LEFT JOIN tcnt t USING (b), tot
            ), wts AS (
              SELECT tbl.id, coalesce(w.w, 0.0) AS w
              FROM tbl LEFT JOIN (
                SELECT id, sum(lr) AS w FROM bucketed JOIN lut USING (b)
                GROUP BY id) w USING (id)
            )
            SELECT id FROM (
              SELECT id, w - ln(-ln(greatest(
                  ('0x' || substr(md5(id::VARCHAR || 'fz'), 1, 8))::BIGINT
                  / 4294967296.0, 1.0 / 4294967296.0))) AS s
              FROM wts)
            ORDER BY s DESC, id LIMIT {k}"""
        want = sorted(r[0] for r in con.execute(sql).fetchall())
        got = sorted(r["id"] for r in kept.collect())
        if got != want:
            failures.append(f"gumbel[{rnd}]: {got} != {want}")

        # --- temperature mix ------------------------------------------
        alpha = rng.choice([0.3, 0.7])
        out = imp.temperature_mix(sdf, "g", "id", alpha=alpha,
                                  salt="fzmix").select("id", "g") \
            .orderBy("id")
        sql = f"""
            WITH c AS (SELECT g, count(*)::DOUBLE AS n FROM tbl GROUP BY g),
            r AS (SELECT g, least(1.0,
                     pow(n, {alpha}) / sum(pow(n, {alpha})) OVER ()
                     * sum(n) OVER () / n) AS rate FROM c)
            SELECT t.id, t.g FROM tbl t JOIN r USING (g)
            WHERE ('0x' || substr(md5(t.id::VARCHAR || 'fzmix'), 1, 8))::BIGINT
                  / 4294967296.0 < r.rate
            ORDER BY t.id"""
        ok, msg = compare(out, con, sql, f"tmix[{rnd}:a={alpha}]")
        if not ok:
            failures.append(msg)

    assert not failures, f"{len(failures)} mismatches:\n" + "\n".join(
        failures[:5])

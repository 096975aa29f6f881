#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle comparison.

Reads each <out>/<name> parquet dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same SF dir, sorts
columns by name, and compares row-by-row (exact).

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [query ...]
"""
import json, sys, glob, os
import duckdb, pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, (list, tuple, np.ndarray)):
            return str(list(v))
        if pd.isna(v):
            return "NULL"
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return str(bool(v))
        # STRICT (round 2): raw renderings, no numeric normalization — the
        # driver hashes raw value strings, so Decimal('10.000000') must NOT
        # be treated as equal to float64 10.0 here. Queries are expected to
        # emit the same physical type (float64/int64) on both engines.
        s = str(v)
        if s.endswith(" 00:00:00"):  # DATE rendered as midnight Timestamp
            s = s[:-9]
        return s
    return df.map(cell)

fails, passes = [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    pqdir = f"{outdir}/{name}"
    files = glob.glob(f"{pqdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        ddf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    a, b = canon(sdf), canon(ddf)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"cols spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"rows spark={len(a)} duck={len(b)}")); continue
    neq = (a.values != b.values)
    if neq.any():
        r, c = np.argwhere(neq)[0]
        fails.append((name, f"first diff row {r} col {a.columns[c]}: "
                            f"spark={a.iat[r, c]!r} duck={b.iat[r, c]!r} "
                            f"({int(neq.sum())} cells)"))
    else:
        passes.append(name)
# External-reader parity: reproduce q_c103's search result from the STORED
# phrase-index parquet ALONE (fresh DuckDB connection, no corpus views) —
# the engine-neutrality proof for the stored-index family: any parquet
# reader can serve the search from the artifact without the source corpus
# or the Spark engine.
def replay_parity(name, dumped_query, sql):
    """Compare a DuckDB replay (artifact files only) against a dumped result."""
    try:
        sdf = pd.concat(
            [pd.read_parquet(f) for f in
             sorted(glob.glob(f"{outdir}/{dumped_query}/*.parquet"))],
            ignore_index=True)
        icon = duckdb.connect()  # deliberately NO corpus views attached
        ddf = icon.execute(sql).df()
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            fails.append((name, f"cols spark={list(a.columns)} index={list(b.columns)}"))
        elif len(a) != len(b):
            fails.append((name, f"rows spark={len(a)} index={len(b)}"))
        elif (a.values != b.values).any():
            fails.append((name, "stored-index replay diverges from the dumped result"))
        else:
            passes.append(name)
    except Exception as e:
        fails.append((name, f"exec error: {e}"))

ipath = f"{outdir}/index_paths.json"
index_paths = json.load(open(ipath)) if os.path.exists(ipath) else {}

# ---- shared CTE builders: ONE copy of each family's replay arithmetic, --
# ---- reused by the plain stored-search row and the post-GC row so the ---
# ---- two replays cannot fork. -------------------------------------------

def bm25_cte(root):
    """BM25 scoring of the fixed query terms off a postings+stats root;
    exposes bm(doc_id, bm25) — the byte-for-byte q_c12 arithmetic."""
    return f"""
        p AS (SELECT term, doc_id, tf, dl FROM '{root}/postings/*.parquet'
              WHERE term IN ('hash','join','filter')),
        s AS (SELECT n_docs, tot FROM '{root}/stats/*.parquet'),
        dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM p GROUP BY 1),
        scored AS (
          SELECT p.doc_id,
            CAST(ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
              * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (s.tot / s.n_docs)))
              AS DECIMAL(18,6)) AS tscore
          FROM p JOIN dfq q USING (term) CROSS JOIN s),
        bm AS (SELECT doc_id, CAST(SUM(tscore) AS DOUBLE) AS bm25
               FROM scored GROUP BY 1)"""

def minhash_cte(root):
    """Banded candidate generation off a stored signature root; exposes
    cand(doc_a, doc_b)."""
    return f"""
        sig AS (SELECT * FROM '{root}/sigs/*.parquet'),
        bands AS (
          SELECT doc_id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
          UNION ALL SELECT doc_id, 1, mh2 || '_' || mh3 FROM sig
          UNION ALL SELECT doc_id, 2, mh4 || '_' || mh5 FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""

def phrase_cte(root):
    """Top-5 phrase selection + (doc, pos+1) adjacency off a stored
    postings+bigrams root; exposes rep(phrase, n_docs, n_occ, first_doc,
    last_doc)."""
    return f"""
        top AS (SELECT w1, w2 FROM '{root}/bigrams/*.parquet'
                ORDER BY cnt DESC, w1, w2 LIMIT 5),
        pp AS (SELECT term, doc_id, pos FROM '{root}/postings/*.parquet'),
        occ AS (SELECT tp.w1, tp.w2, a.doc_id
                FROM top tp
                JOIN pp a ON a.term = tp.w1
                JOIN pp b ON b.term = tp.w2 AND b.doc_id = a.doc_id
                          AND b.pos = a.pos + 1),
        rep AS (SELECT w1 || ' ' || w2 AS phrase,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(COUNT(*) AS BIGINT) AS n_occ,
          CAST(MIN(doc_id) AS BIGINT) AS first_doc,
          CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM occ GROUP BY w1, w2)"""

def gc_cte(idx):
    """GC outcome off a GC'd artifact root: n_dropped re-counted from the
    gc_log journal (DISTINCT segments with a dropped action — a
    multi-table family journals one row per table but drops each
    directory once) and n_live_segments re-derived by GLOBBING the
    artifact's segments directory — if the engine claimed a drop it
    didn't perform (or performed one it didn't journal), the filesystem
    contradicts the dumped frame here."""
    return f"""
        g AS (SELECT CAST(COUNT(DISTINCT CASE WHEN action = 'dropped'
                     THEN segment END) AS BIGINT) AS n_dropped
              FROM '{idx}/gc_log/*.parquet'),
        live AS (SELECT CAST(COUNT(DISTINCT regexp_extract(file, 'segments/([^/]+)/', 1))
                   AS BIGINT) AS n_live_segments
                 FROM glob('{idx}/segments/*/*/*.parquet'))"""

if "bm25_index" in index_paths and (only is None or "q_c45_bm25_stored" in only):
    # BM25 from the stored postings+stats alone: same fixed query terms
    # and the byte-for-byte q_c12 scoring arithmetic the oracle uses.
    idx = index_paths["bm25_index"]
    replay_parity("q_c45_from_stored_index", "q_c45_bm25_stored", f"""
        WITH {bm25_cte(idx)}
        SELECT doc_id, bm25 FROM bm
        ORDER BY bm25 DESC, doc_id LIMIT 20""")
if "minhash_index" in index_paths and (only is None or "q_c66_minhash_stored" in only):
    # Banded candidate generation from the stored 48 B/doc signature
    # table alone — the q_c1/q_c66 dedup blocker without the corpus.
    idx = index_paths["minhash_index"]
    replay_parity("q_c66_from_stored_index", "q_c66_minhash_stored", f"""
        WITH {minhash_cte(idx)}
        SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""")
if "phrase_index" in index_paths and (only is None or "q_c103_phrase_search" in only):
    # Phrase search from the stored positional postings + bigram table
    # alone: top-5 phrase selection and the (doc, pos+1) intersection.
    idx = index_paths["phrase_index"]
    replay_parity("q_c103_from_stored_index", "q_c103_phrase_search", f"""
        WITH {phrase_cte(idx)}
        SELECT phrase, n_docs, n_occ, first_doc, last_doc
        FROM rep ORDER BY phrase""")

def ivf_stage1_cte(root):
    """Symmetric-int8 stage-1 search off a stored IVF root: hex-unpack
    the packed int8 BINARY codes, re-quantize the stored centroids
    through the same half-away-from-zero pack rule, rank probe cells and
    candidates by the symmetric int8 cosine. Every score is (exact
    integer dot) / (sqrt * sqrt tail) — bit-identical across IEEE
    engines. Exposes res(query_id, arank, vec_id, ascore)."""
    cos = lambda a, b: (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i])) AS DOUBLE) / greatest("
        f"sqrt(CAST(list_sum(list_transform({a}, v -> v * v)) AS DOUBLE)) * "
        f"sqrt(CAST(list_sum(list_transform({b}, v -> v * v)) AS DOUBLE)), 1e-12)")
    return f"""
        m AS (SELECT nprobe FROM '{root}/model/*.parquet'),
        cq AS (SELECT cell, list_transform(ctr,
                 x -> CAST(CASE WHEN x * s >= 0 THEN floor(x * s + 0.5)
                           ELSE ceil(x * s - 0.5) END AS BIGINT)) AS c8
               FROM (SELECT cell, ctr,
                       127.0 / greatest(list_max(list_transform(ctr, x -> abs(x))), 1e-12) AS s
                     FROM '{root}/cents/*.parquet')),
        co AS (SELECT vec_id, cell, hex(q8) AS hx, octet_length(q8) AS n
               FROM '{root}/codes/*.parquet'),
        cu AS (SELECT vec_id, cell, list_transform(range(1, n + 1),
                 i -> CASE WHEN CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS BIGINT) > 127
                      THEN CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS BIGINT) - 256
                      ELSE CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS BIGINT) END) AS xs
               FROM co),
        q AS (SELECT vec_id AS query_id, xs AS p FROM cu WHERE vec_id % 100 = 0),
        ps AS (SELECT q.query_id, q.p, cq.cell, {cos('q.p', 'cq.c8')} AS pscore
               FROM q CROSS JOIN cq),
        pr AS (SELECT query_id, p, cell FROM
                 (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY pscore DESC, cell) AS prank FROM ps)
               WHERE prank <= (SELECT nprobe FROM m)),
        sc AS (SELECT pr.query_id, cu.vec_id, pr.cell, {cos('cu.xs', 'pr.p')} AS ascore
               FROM pr JOIN cu ON cu.cell = pr.cell AND cu.vec_id <> pr.query_id),
        c1 AS (SELECT * FROM
                 (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, cell
                    ORDER BY ascore DESC, vec_id) AS crk FROM sc)
               WHERE crk <= 20),
        f AS (SELECT query_id, vec_id, ascore,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY ascore DESC, vec_id) AS arank FROM c1),
        res AS (SELECT query_id, CAST(arank AS BIGINT) AS arank, vec_id, ascore
                FROM f WHERE arank <= 20)"""

if "ivf_index" in index_paths and (only is None or "q_c131_ivf_stage1" in only):
    idx = index_paths["ivf_index"]
    replay_parity("q_c131_from_stored_index", "q_c131_ivf_stage1", f"""
        WITH {ivf_stage1_cte(idx)}
        SELECT query_id, arank, vec_id, ascore FROM res
        ORDER BY query_id, arank""")

if "bm25_gc" in index_paths and (only is None or "q_c141_retirement_gc" in only):
    # Post-GC search + GC outcome from the GC'd artifact alone: the q_c45
    # BM25 scoring over the surviving compacted postings/stats + gc_cte.
    idx = index_paths["bm25_gc"]
    replay_parity("q_c141_from_gc_artifact", "q_c141_retirement_gc", f"""
        WITH {bm25_cte(idx + '/compacted')},
        {gc_cte(idx)}
        SELECT bm.doc_id, bm.bm25, g.n_dropped, live.n_live_segments
        FROM bm CROSS JOIN g CROSS JOIN live
        ORDER BY bm.bm25 DESC, bm.doc_id LIMIT 20""")

if "minhash_gc" in index_paths and (only is None or "q_c144_minhash_gc" in only):
    # MinHash GC: banded candidates off the surviving compacted
    # signature table + gc_cte.
    idx = index_paths["minhash_gc"]
    replay_parity("q_c144_from_gc_artifact", "q_c144_minhash_gc", f"""
        WITH {minhash_cte(idx + '/compacted')},
        {gc_cte(idx)}
        SELECT cand.doc_a, cand.doc_b, g.n_dropped, live.n_live_segments
        FROM cand CROSS JOIN g CROSS JOIN live
        ORDER BY doc_a, doc_b""")

if "ivf_gc" in index_paths and (only is None or "q_c145_ivf_gc" in only):
    # int8-IVF GC: symmetric stage-1 off the surviving compacted
    # model/cents/codes + gc_cte.
    idx = index_paths["ivf_gc"]
    replay_parity("q_c145_from_gc_artifact", "q_c145_ivf_gc", f"""
        WITH {ivf_stage1_cte(idx + '/compacted')},
        {gc_cte(idx)}
        SELECT res.query_id, res.arank, res.vec_id, res.ascore,
          g.n_dropped, live.n_live_segments
        FROM res CROSS JOIN g CROSS JOIN live
        ORDER BY query_id, arank""")

if (all(k in index_paths for k in ("bm25_gc", "minhash_gc", "ivf_gc", "phrase_gc"))
        and (only is None or "q_c148_gc_audit" in only)):
    # Cross-family GC audit pane from the four GC'd artifacts alone:
    # journal aggregates + the LIVE segment listing per family.
    def audit_row(fam, idx):
        return f"""
        SELECT '{fam}' AS family,
          CAST(COUNT(DISTINCT tbl) AS BIGINT) AS n_tables,
          CAST(COUNT(*) AS BIGINT) AS n_journal_rows,
          CAST(COUNT(DISTINCT CASE WHEN action = 'dropped' THEN segment END)
            AS BIGINT) AS n_dropped,
          CAST(MIN(retire) AS BIGINT) AS all_certified,
          (SELECT CAST(COUNT(DISTINCT regexp_extract(file, 'segments/([^/]+)/', 1))
             AS BIGINT)
           FROM glob('{idx}/segments/*/*/*.parquet')) AS n_live_segments
        FROM '{idx}/gc_log/*.parquet'"""
    audit_sql = " UNION ALL ".join(
        audit_row(f, index_paths[k]) for f, k in
        [("bm25", "bm25_gc"), ("ivf", "ivf_gc"),
         ("minhash", "minhash_gc"), ("phrase", "phrase_gc")])
    replay_parity("q_c148_from_gc_artifacts", "q_c148_gc_audit",
                  audit_sql + " ORDER BY family")

if "phrase_gc" in index_paths and (only is None or "q_c146_phrase_gc" in only):
    # Phrase GC (the multi-table family): the q_c103 search off the
    # surviving compacted postings+bigrams + gc_cte.
    idx = index_paths["phrase_gc"]
    replay_parity("q_c146_from_gc_artifact", "q_c146_phrase_gc", f"""
        WITH {phrase_cte(idx + '/compacted')},
        {gc_cte(idx)}
        SELECT rep.phrase, rep.n_docs, rep.n_occ, rep.first_doc, rep.last_doc,
          g.n_dropped, live.n_live_segments
        FROM rep CROSS JOIN g CROSS JOIN live
        ORDER BY phrase""")

def cls_margin_parts(idx):
    """(margin_sql, bucket_sql, cnt_cols_sql) for a stored cls model:
    the 65 doubles (weights + bias) are read off the artifact parquet
    and inlined as shortest-round-trip literals (a correctly-rounded
    parse restores the exact bits); the margin re-folds in the engine's
    FIXED index order b = 0..63 — every double op is the same IEEE op
    on both engines, so score compares are bit-exact (the IVF replay's
    discipline)."""
    mcon = duckdb.connect()
    wdf = mcon.execute(
        f"SELECT bucket, weight FROM '{idx}/weights/*.parquet' ORDER BY bucket").df()
    bias = float(mcon.execute(f"SELECT w_bias FROM '{idx}/meta/*.parquet'").fetchone()[0])
    ws = [float(w) for w in wdf["weight"]]
    fold = "0.0"
    for b, w in enumerate(ws):
        fold = f"({fold} + CAST(c{b} AS DOUBLE) * {w!r})"
    margin = f"({fold} / CAST(greatest(n_tokens, 1) AS DOUBLE) + {bias!r})"
    bucket = ("(list_reduce(list_prepend(CAST(0 AS BIGINT), "
              "[CAST(ascii(x) AS BIGINT) for x in string_split(w, '')]), "
              "(acc, ch) -> (acc * 31 + ch) % 1000000007) % 64)")
    cnt_cols = ",\n               ".join(
        f"len(list_filter(bs, x -> x = {b})) AS c{b}" for b in range(len(ws)))
    return margin, bucket, cnt_cols

if "cls_model" in index_paths and (only is None or "q_c138_classifier_scores" in only):
    # Trained-classifier scoring from the STORED MODEL alone: weights +
    # documents, no Spark. Labels re-derive from the q_c31 rules over
    # the documents parquet.
    idx = index_paths["cls_model"]
    margin, bucket, cnt_cols = cls_margin_parts(idx)
    replay_parity("q_c138_from_stored_model", "q_c138_classifier_scores", f"""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM '{sfdir}/documents.parquet'),
        rt AS (SELECT doc_id, [w for w in string_split(lower(text), ' ') if len(w) > 0] AS ws
               FROM '{sfdir}/documents.parquet'),
        rm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS sumlen,
                 CAST(len(list_intersect(ws, ['the','of','and','to','in'])) AS BIGINT) AS stop_hits,
                 CAST(len(list_distinct(ws)) AS BIGINT) AS uniq
               FROM rt),
        lab AS (SELECT doc_id,
                  CAST(CASE WHEN n_words >= 50 AND 3 * n_words <= sumlen
                    AND 2 * sumlen <= 9 * n_words AND stop_hits >= 1
                    AND 5 * uniq >= 2 * n_words THEN 1 ELSE 0 END AS BIGINT) AS label
                FROM rm),
        h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                list_transform(toks, w -> {bucket}) AS bs
              FROM t),
        c AS (SELECT doc_id, n_tokens,
               {cnt_cols}
              FROM h),
        sc AS (SELECT doc_id, n_tokens, {margin} AS score FROM c)
        SELECT sc.doc_id, lab.label, sc.n_tokens, sc.score,
          CASE WHEN sc.score > 0 THEN 'keep' ELSE 'drop' END AS cls,
          CAST(CASE WHEN (sc.score > 0) = (lab.label = 1) THEN 1 ELSE 0 END AS BIGINT) AS correct
        FROM sc JOIN lab USING (doc_id) ORDER BY sc.doc_id""")

if "cls_model_drift" in index_paths and (only is None or "q_c143_model_drift" in only):
    # Drift monitor from the artifact + documents alone: baseline read
    # off the stored baseline parquet, the arriving batch (doc_id % 10
    # = 3) re-scored with the stored weights, same integer discipline
    # (margins trunc'd toward zero at micros — matching Spark's
    # double→long cast — raw sums; mean margins via BIGINT `//`, which
    # truncates toward zero on negatives exactly like Spark's `div`).
    # Alarm = keep-rate ≥ 100 permille OR mean margin ≥ 100000 micros.
    idx = index_paths["cls_model_drift"]
    margin, bucket, cnt_cols = cls_margin_parts(idx)
    replay_parity("q_c143_from_stored_model", "q_c143_model_drift", f"""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM '{sfdir}/documents.parquet' WHERE doc_id % 10 = 3),
        h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                list_transform(toks, w -> {bucket}) AS bs
              FROM t),
        c AS (SELECT doc_id, n_tokens,
               {cnt_cols}
              FROM h),
        sc AS (SELECT doc_id, {margin} AS score FROM c),
        b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
                CAST(COALESCE(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_keep,
                CAST(COALESCE(SUM(CAST(trunc(score * 1000000.0) AS BIGINT)), 0) AS BIGINT)
                  AS ms_batch
              FROM sc),
        base AS (SELECT n_docs AS n_base, keep_pm AS keep_pm_base,
                   margin_sum_micros AS ms_base
                 FROM '{idx}/baseline/*.parquet'),
        j AS (SELECT base.n_base, base.keep_pm_base,
                CAST(base.ms_base // greatest(base.n_base, 1) AS BIGINT)
                  AS mean_margin_micros_base,
                b.n_batch,
                CAST(b.n_keep * 1000 // greatest(b.n_batch, 1) AS BIGINT)
                  AS keep_pm_batch,
                CAST(b.ms_batch // greatest(b.n_batch, 1) AS BIGINT)
                  AS mean_margin_micros_batch
              FROM b CROSS JOIN base)
        SELECT n_base, keep_pm_base, mean_margin_micros_base,
          n_batch, keep_pm_batch, mean_margin_micros_batch,
          keep_pm_batch - keep_pm_base AS delta_keep_pm,
          mean_margin_micros_batch - mean_margin_micros_base AS delta_mean_micros,
          CAST(CASE WHEN abs(keep_pm_batch - keep_pm_base) >= 100
                      OR abs(mean_margin_micros_batch - mean_margin_micros_base) >= 100000
               THEN 1 ELSE 0 END AS BIGINT) AS alarm
        FROM j""")

if ("cls_model_pre" in index_paths and "cls_model_post" in index_paths
        and (only is None or "q_c147_retrain_on_drift" in only)):
    # Retrain-on-drift from the TWO stored artifacts + nothing else:
    # the drift bucket argmax, the token lookup, the 50-doc batch
    # construction, both phases' scoring and alarms are all re-derived
    # in SQL — pre off the original artifact, post off the retrained
    # one (whose baseline covers corpus ∪ batch). The token table is
    # the same constant as QualityClassifierTrainer.driftTokens.
    pre_idx = index_paths["cls_model_pre"]
    post_idx = index_paths["cls_model_post"]
    drift_tokens = [
        "t4", "t5", "t6", "t7", "t8", "t9", "t109", "t209", "t309", "t409",
        "t509", "t90", "t91", "t70", "t71", "t50", "t51", "t30", "t31", "t10",
        "t11", "t12", "t13", "t14", "t15", "t16", "t17", "t18", "t19", "t111",
        "t112", "t113", "t114", "t115", "t116", "t117", "t118", "t119", "t219",
        "t319", "t419", "t519", "t619", "t719", "t80", "t81", "t60", "t61",
        "t40", "t41", "t20", "t21", "t22", "t23", "t24", "t25", "t26", "t27",
        "t28", "t29", "t0", "t1", "t2", "t3"]
    tok_values = ", ".join(f"({b}, '{t}')" for b, t in enumerate(drift_tokens))
    margin_pre, bucket_sql, cnt_cols = cls_margin_parts(pre_idx)
    margin_post, _, _ = cls_margin_parts(post_idx)

    def drift_phase(sfx, idx, margin):
        """CTE chain scoring the constructed batch against one artifact;
        exposes j{sfx} with the nine drift-report columns."""
        return f"""
        t{sfx} AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM batch),
        h{sfx} AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                     list_transform(toks, w -> {bucket_sql}) AS bs
                   FROM t{sfx}),
        c{sfx} AS (SELECT doc_id, n_tokens, {cnt_cols} FROM h{sfx}),
        sc{sfx} AS (SELECT doc_id, {margin} AS score FROM c{sfx}),
        b{sfx} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
                CAST(COALESCE(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_keep,
                CAST(COALESCE(SUM(CAST(trunc(score * 1000000.0) AS BIGINT)), 0) AS BIGINT) AS ms
              FROM sc{sfx}),
        base{sfx} AS (SELECT n_docs AS n_base, keep_pm AS keep_pm_base,
                        margin_sum_micros AS ms_base
                      FROM '{idx}/baseline/*.parquet'),
        j{sfx} AS (SELECT base{sfx}.n_base, base{sfx}.keep_pm_base,
                CAST(base{sfx}.ms_base // greatest(base{sfx}.n_base, 1) AS BIGINT)
                  AS mean_margin_micros_base,
                b{sfx}.n_batch,
                CAST(b{sfx}.n_keep * 1000 // greatest(b{sfx}.n_batch, 1) AS BIGINT)
                  AS keep_pm_batch,
                CAST(b{sfx}.ms // greatest(b{sfx}.n_batch, 1) AS BIGINT)
                  AS mean_margin_micros_batch
              FROM b{sfx} CROSS JOIN base{sfx})"""

    replay_parity("q_c147_from_stored_models", "q_c147_retrain_on_drift", f"""
        WITH bsel AS (
          SELECT w.bucket AS b
          FROM '{pre_idx}/weights/*.parquet' w
          CROSS JOIN (SELECT w_bias FROM '{pre_idx}/meta/*.parquet') m
          CROSS JOIN (SELECT margin_sum_micros // greatest(n_docs, 1) AS mean_b
                      FROM '{pre_idx}/baseline/*.parquet') base
          ORDER BY abs(CAST(trunc((w.weight + m.w_bias) * 1000000.0) AS BIGINT)
                       - base.mean_b) DESC, w.bucket
          LIMIT 1),
        tokt AS (SELECT * FROM (VALUES {tok_values}) AS tv(b, tok)),
        batch AS (SELECT CAST(10000000 + r.i AS BIGINT) AS doc_id, tokt.tok AS text
                  FROM range(1, 51) r(i), tokt, bsel WHERE tokt.b = bsel.b),
        {drift_phase('A', pre_idx, margin_pre)},
        {drift_phase('B', post_idx, margin_post)},
        phased AS (
          SELECT 'pre' AS phase, * FROM jA
          UNION ALL SELECT 'post', * FROM jB)
        SELECT phase, n_base, keep_pm_base, mean_margin_micros_base,
          n_batch, keep_pm_batch, mean_margin_micros_batch,
          keep_pm_batch - keep_pm_base AS delta_keep_pm,
          mean_margin_micros_batch - mean_margin_micros_base AS delta_mean_micros,
          CAST(CASE WHEN abs(keep_pm_batch - keep_pm_base) >= 100
                      OR abs(mean_margin_micros_batch - mean_margin_micros_base) >= 100000
               THEN 1 ELSE 0 END AS BIGINT) AS alarm
        FROM phased ORDER BY phase DESC""")

# Retirement-verdict replays: the GC decision recomputed from the artifact
# files alone — same canonical row encoding (columns in sorted-name order,
# '|'-joined, STRING values length-prefixed `<len>:<value>` so content can
# never shift across the separator, BINARY values hex()'d), same md5
# 64-bit-half chunks, same additive mod-2^60 sums (weighted mode multiplies
# each chunk by the row's weight before summing), same atomic verdict — the
# decision to delete a segment directory is auditable by any engine.
M60 = 1152921504606846976

def retire_dig(name, src, canon_cols, weight=None):
    n = f"CAST(SUM({weight}) AS BIGINT)" if weight else "CAST(COUNT(*) AS BIGINT)"
    w = f" * {weight}" if weight else ""
    keep = f", {weight}" if weight else ""
    return f"""
        SELECT '{name}' AS segment, {n} AS n_rows,
          CAST(SUM(CAST(CAST('0x' || substr(h, 1, 16) AS UBIGINT) AS HUGEINT){w})
            % {M60} AS BIGINT) AS checksum_a,
          CAST(SUM(CAST(CAST('0x' || substr(h, 17, 16) AS UBIGINT) AS HUGEINT){w})
            % {M60} AS BIGINT) AS checksum_b
        FROM (SELECT md5(concat_ws('|', {canon_cols})) AS h{keep}
              FROM '{src}/*.parquet')"""

def retire_replay(name, dumped_query, segp, compp, table, canon_cols, weight=None):
    replay_parity(name, dumped_query, f"""
        WITH d AS ({retire_dig('seg0', f'{segp}/seg0/{table}', canon_cols, weight)}
          UNION ALL {retire_dig('seg1', f'{segp}/seg1/{table}', canon_cols, weight)}
          UNION ALL {retire_dig('compacted', f'{compp}/{table}', canon_cols, weight)}),
        u AS (SELECT SUM(n_rows) AS u_rows,
                CAST(SUM(CAST(checksum_a AS HUGEINT)) % {M60} AS BIGINT) AS u_a,
                CAST(SUM(CAST(checksum_b AS HUGEINT)) % {M60} AS BIGINT) AS u_b
              FROM d WHERE segment <> 'compacted'),
        c AS (SELECT n_rows AS c_rows, checksum_a AS c_a, checksum_b AS c_b
              FROM d WHERE segment = 'compacted'),
        v AS (SELECT CAST(CASE WHEN u.u_rows = c.c_rows AND u.u_a = c.c_a
                          AND u.u_b = c.c_b THEN 1 ELSE 0 END AS BIGINT) AS retire
              FROM u, c)
        SELECT d.segment, d.n_rows, d.checksum_a, d.checksum_b, v.retire
        FROM d, v ORDER BY d.segment""")

lp = lambda c: f"length({c}) || ':' || {c}"  # the string length prefix

if "bm25_segments" in index_paths and (only is None or "q_c133_segment_retirement" in only):
    retire_replay("q_c133_from_stored_segments", "q_c133_segment_retirement",
        index_paths["bm25_segments"], index_paths["bm25_compacted"],
        "postings", f"dl, doc_id, {lp('term')}, tf")

if "minhash_segments" in index_paths and (only is None or "q_c134_minhash_retirement" in only):
    retire_replay("q_c134_from_stored_segments", "q_c134_minhash_retirement",
        index_paths["minhash_segments"], index_paths["minhash_compacted"],
        "sigs", "doc_id, mh0, mh1, mh2, mh3, mh4, mh5")

if "ivf_segments" in index_paths and (only is None or "q_c135_ivf_retirement" in only):
    retire_replay("q_c135_from_stored_segments", "q_c135_ivf_retirement",
        index_paths["ivf_segments"], index_paths["ivf_compacted"],
        "codes", "cell, hex(q8), vec_id")

if "phrase_segments" in index_paths and (only is None or "q_c136_phrase_retirement" in only):
    # both table shapes, each with its own verdict, labeled by `tbl`
    segp, compp = index_paths["phrase_segments"], index_paths["phrase_compacted"]
    def tdig(tbl, name, src, canon_cols, weight=None):
        return f"SELECT '{tbl}' AS tbl, * FROM ({retire_dig(name, src, canon_cols, weight)})"
    blocks = []
    for tbl, canon_cols, weight in [
            ("postings", f"doc_id, pos, {lp('term')}", None),
            ("bigrams", f"{lp('w1')}, {lp('w2')}", "cnt")]:
        blocks += [tdig(tbl, 'seg0', f'{segp}/seg0/{tbl}', canon_cols, weight),
                   tdig(tbl, 'seg1', f'{segp}/seg1/{tbl}', canon_cols, weight),
                   tdig(tbl, 'compacted', f'{compp}/{tbl}', canon_cols, weight)]
    union = "\n          UNION ALL ".join(blocks)
    replay_parity("q_c136_from_stored_segments", "q_c136_phrase_retirement", f"""
        WITH d AS ({union}),
        u AS (SELECT tbl, SUM(n_rows) AS u_rows,
                CAST(SUM(CAST(checksum_a AS HUGEINT)) % {M60} AS BIGINT) AS u_a,
                CAST(SUM(CAST(checksum_b AS HUGEINT)) % {M60} AS BIGINT) AS u_b
              FROM d WHERE segment <> 'compacted' GROUP BY tbl),
        c AS (SELECT tbl, n_rows AS c_rows, checksum_a AS c_a, checksum_b AS c_b
              FROM d WHERE segment = 'compacted'),
        v AS (SELECT u.tbl, CAST(CASE WHEN u.u_rows = c.c_rows AND u.u_a = c.c_a
                          AND u.u_b = c.c_b THEN 1 ELSE 0 END AS BIGINT) AS retire
              FROM u JOIN c ON u.tbl = c.tbl)
        SELECT d.tbl, d.segment, d.n_rows, d.checksum_a, d.checksum_b, v.retire
        FROM d JOIN v ON d.tbl = v.tbl ORDER BY d.tbl, d.segment""")

print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"FAIL ({len(fails)}):")
for n, m in fails:
    print(f"  {n}: {m}")

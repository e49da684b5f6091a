"""Text-analysis operators over a documents table: language-ID, quality
scoring, token counting, document fingerprinting.

Large-scale-training-data additions beyond the reference's operator set
(per the build brief); each is a vectorized ``map_batches`` stage over
``documents(doc_id, text, lang, source, n_chars)``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray

# --------------------------------------------------------------------------
# wordcount / token counting
# --------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2-style pretoken split, simplified to pure regex). The symbol
# class spells out RE2's ASCII [^\w\s] ([^0-9A-Za-z_] minus [\t\n\f\r ])
# explicitly — Python's \w/\s are Unicode, so the shorthand would count
# 'café' as ONE token while the DuckDB oracle counts two (empirically
# parity-checked against regexp_extract_all on é/\x0b/\xa0 inputs)
_BPEISH_RE = re.compile(
    r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^0-9A-Za-z_\t\n\f\r ]")


def wordcount_batch(batch: pa.Table) -> pa.Table:
    """doc_id, wordcount = len(text.split()) — whitespace token count with
    the same semantics as the reference WordCount pipeline
    (pipelines/wordcount.py:13-18)."""
    texts = batch.column("text").to_pylist()
    wc = [len(t.split()) if t is not None else 0 for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "wordcount": pa.array(wc, pa.int64())})


def tokencount_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_ws_tokens (whitespace), n_bpeish_tokens (regex
    pre-tokenizer) — the two token-budget estimators."""
    texts = batch.column("text").to_pylist()
    ws = [len(t.split()) if t else 0 for t in texts]
    bp = [len(_BPEISH_RE.findall(t)) if t else 0 for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_ws_tokens": pa.array(ws, pa.int64()),
                     "n_bpeish_tokens": pa.array(bp, pa.int64())})


# --------------------------------------------------------------------------
# language identification (character n-gram heuristic)
# --------------------------------------------------------------------------

# tiny per-language trigram profiles (highest-frequency trigrams with
# weights) — enough to separate en/de/fr/es on real text
_LANG_PROFILES: dict[str, dict[str, float]] = {
    "en": {" th": 3, "the": 3, "he ": 2, "ing": 2, "and": 2, " an": 1,
           "nd ": 1, " of": 2, "of ": 1, "ion": 1, " to": 1, "ed ": 1,
           " in": 1, "tio": 1, " wa": 1, "is ": 1},
    "de": {"en ": 3, "er ": 3, " de": 3, "der": 2, "ie ": 2, "die": 2,
           "ein": 2, "ich": 2, "und": 2, " un": 1, "ch ": 2, "sch": 2,
           "ung": 2, " ge": 1, "ten": 1, "ber": 1},
    "fr": {" de": 3, "de ": 3, " le": 3, "es ": 2, "le ": 2, "ent": 2,
           "la ": 2, " la": 2, "ion": 1, "re ": 1, "que": 2, " qu": 1,
           "les": 1, "ur ": 1, " pa": 1, "ais": 1},
    "es": {" de": 3, "de ": 3, "os ": 2, " la": 2, "la ": 2, "ión": 2,
           "es ": 2, " es": 1, "ent": 1, "el ": 2, " el": 1, "que": 2,
           " qu": 1, "ar ": 1, "aci": 1, "ado": 1},
}


class LangId:
    """Actor-pool language-ID: profiles built once per actor; per doc the
    language with the highest trigram-weight density wins ('und' when no
    evidence)."""

    def __init__(self) -> None:
        self.profiles = {lang: dict(p) for lang, p in _LANG_PROFILES.items()}

    def classify(self, text: str) -> tuple[str, float]:
        t = " " + re.sub(r"\s+", " ", text.lower()) + " "
        n = len(t) - 2
        if n <= 0:
            return "und", 0.0
        scores = {}
        for lang, prof in self.profiles.items():
            s = 0.0
            for tri, w in prof.items():
                c = t.count(tri)
                if c:
                    s += w * c
            scores[lang] = s / n
        best = max(scores, key=lambda k: (scores[k], k))
        if scores[best] <= 0:
            return "und", 0.0
        return best, scores[best]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, conf = [], []
        for t in texts:
            l, c = self.classify(t or "")
            langs.append(l)
            conf.append(c)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pred_lang": pa.array(langs, pa.string()),
                         "lang_score": pa.array(conf, pa.float64())})


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is was for on with as by at it this that "
    "be are from he she they we you his her its not have had but".split())


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality signals (C4/Gopher-style rule features):
    n_chars, n_words, mean_word_len, alpha_ratio, digit_ratio,
    punct_ratio, stopword_ratio, ends_with_punct. Ratios are exact
    int/int doubles (bit-identical to any engine computing the same
    counts)."""
    texts = batch.column("text").to_pylist()
    rows = {k: [] for k in ("n_chars", "n_words", "mean_word_len",
                            "alpha_ratio", "digit_ratio", "punct_ratio",
                            "stopword_ratio", "ends_with_punct")}
    for t in texts:
        t = t or ""
        n = len(t)
        words = t.split()
        nw = len(words)
        # ASCII classes (not str.isalpha) so an ANSI-SQL oracle using
        # [A-Za-z]/[0-9] computes the identical counts on unicode text
        alpha = sum("A" <= ch <= "Z" or "a" <= ch <= "z" for ch in t)
        digit = sum("0" <= ch <= "9" for ch in t)
        punct = sum(ch in ".,;:!?'\"()-" for ch in t)
        stop = sum(w.lower().strip(".,;:!?'\"()") in _STOPWORDS
                   for w in words)
        rows["n_chars"].append(n)
        rows["n_words"].append(nw)
        rows["mean_word_len"].append(
            (sum(len(w) for w in words) / nw) if nw else 0.0)
        rows["alpha_ratio"].append(alpha / n if n else 0.0)
        rows["digit_ratio"].append(digit / n if n else 0.0)
        rows["punct_ratio"].append(punct / n if n else 0.0)
        rows["stopword_ratio"].append(stop / nw if nw else 0.0)
        # tuple membership, not substring: whitespace-only text rstrips
        # to '' and '' in ".!?" is substring-True — the oracle's
        # CASE WHEN length(rtrim(text))=0 THEN FALSE says False
        rows["ends_with_punct"].append(
            t.rstrip()[-1:] in (".", "!", "?", '"', "'"))
    out = {"doc_id": batch.column("doc_id")}
    for k, v in rows.items():
        typ = (pa.int64() if k in ("n_chars", "n_words")
               else pa.bool_() if k == "ends_with_punct" else pa.float64())
        out[k] = pa.array(v, typ)
    return pa.table(out)


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
# appendix A — the published repetition/format heuristics used to filter
# MassiveWeb; here the per-document rule features plus the combined gate)
# --------------------------------------------------------------------------

_GOPHER_REQ_STOP = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with"))
_GOPHER_BULLETS = ("•", "‣", "▪", "-", "*")


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher rule features and the combined ``pass_gopher``
    gate. All ratios are exact int/int doubles so an ANSI-SQL oracle
    computing the same counts is bit-identical. Rules (thresholds per
    the paper): 50 <= n_words <= 100000; 3 <= mean_word_len <= 10;
    symbol-to-word ratio ('#', '…', '...') < 0.1; <= 90% of lines
    bullet-led; <= 30% of lines ellipsis-ended; >= 80% of words
    contain an ASCII letter; >= 2 distinct required stop words."""
    texts = batch.column("text").to_pylist()
    cols = {k: [] for k in (
        "n_words", "mean_word_len", "symbol_ratio", "bullet_ratio",
        "ellipsis_ratio", "alpha_word_ratio", "n_req_stop",
        "pass_gopher")}
    for t in texts:
        t = t or ""
        words = t.split()
        nw = len(words)
        lines = t.split("\n")
        nl = len(lines)  # >= 1 always ('' -> [''])
        mwl = (sum(len(w) for w in words) / nw) if nw else 0.0
        symbols = t.count("#") + t.count("…") + t.count("...")
        sym_r = symbols / nw if nw else 0.0
        nb = sum(ln.lstrip(" ")[:1] in _GOPHER_BULLETS for ln in lines)
        ne = sum(ln.rstrip(" ").endswith(("...", "…")) for ln in lines)
        alpha_w = sum(
            any("A" <= c <= "Z" or "a" <= c <= "z" for c in w)
            for w in words)
        alpha_r = alpha_w / nw if nw else 0.0
        n_stop = len({w.lower().strip(".,;:!?'\"()") for w in words}
                     & _GOPHER_REQ_STOP)
        ok = (50 <= nw <= 100_000 and 3.0 <= mwl <= 10.0
              and sym_r < 0.1 and nb / nl <= 0.9 and ne / nl <= 0.3
              and alpha_r >= 0.8 and n_stop >= 2)
        cols["n_words"].append(nw)
        cols["mean_word_len"].append(mwl)
        cols["symbol_ratio"].append(sym_r)
        cols["bullet_ratio"].append(nb / nl)
        cols["ellipsis_ratio"].append(ne / nl)
        cols["alpha_word_ratio"].append(alpha_r)
        cols["n_req_stop"].append(n_stop)
        cols["pass_gopher"].append(ok)
    out = {"doc_id": batch.column("doc_id")}
    for k, v in cols.items():
        typ = (pa.int64() if k in ("n_words", "n_req_stop")
               else pa.bool_() if k == "pass_gopher" else pa.float64())
        out[k] = pa.array(v, typ)
    return pa.table(out)


# --------------------------------------------------------------------------
# document fingerprinting (rolling hash)
# --------------------------------------------------------------------------

_B = 1_000_003
_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 16) -> tuple[int, int]:
    """Rolling Rabin-Karp fingerprints over all ``window``-byte windows:
    (fp_min, fp_xor). fp_min is the winnowing-style minimum (robust to
    local edits — two docs sharing any window can match); fp_xor folds
    every window hash, so ANY byte change flips it (content identity)."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return 0, 0
    if n <= window:
        h = 0
        for b in data:
            h = (h * _B + b) % _MOD
        return h, h
    h = 0
    pow_w = pow(_B, window - 1, _MOD)
    best = _MOD
    acc = 0
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pow_w) % _MOD
        h = (h * _B + b) % _MOD
        if i >= window - 1:
            if h < best:
                best = h
            acc ^= h
    return best, acc


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id, fp_min (winnow min), fp_xor (all-window fold), fp_md5."""
    texts = batch.column("text").to_pylist()
    fps = [rolling_fingerprint(t or "") for t in texts]
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp_min": pa.array([f[0] for f in fps], pa.int64()),
                     "fp_xor": pa.array([f[1] for f in fps], pa.int64()),
                     "fp_md5": pa.array(md5s, pa.string())})


# --------------------------------------------------------------------------
# dataset-level wrappers
# --------------------------------------------------------------------------

def documents_ds(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_wordcount(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        wordcount_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_tokencount(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        tokencount_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_quality(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_gopher(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        gopher_quality_batch, batch_format="pyarrow",
        zero_copy_batch=True)


def q_langid(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=2)


def q_fingerprint(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_counts(sf_dir: str):
    """Grouped count by the table's own lang column (SQL-checkable)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang"])
    from ray.data.aggregate import Count
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


# --------------------------------------------------------------------------
# composed curation pipelines (filter + dedup + aggregate at corpus scale)
# --------------------------------------------------------------------------

_CTRL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Text normalization (the standard pre-tokenization cleanup):
    strip C0/DEL control characters, collapse ASCII whitespace runs to
    one space, trim. Explicit character classes (not ``\\s``) so an
    ANSI-SQL RE2 oracle computes the identical result. Compiled
    regexes are module-level (C-speed per batch)."""
    out = []
    for t in batch.column("text").to_pylist():
        t = _CTRL_RE.sub("", t or "")
        t = _WS_RE.sub(" ", t).strip(" ")
        out.append(t)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_norm": pa.array(out, pa.string()),
        "n_chars_norm": pa.array([len(t) for t in out], pa.int64())})


def q_normalize(sf_dir: str):
    """Stateless normalization map over the corpus."""
    return documents_ds(sf_dir).map_batches(
        normalize_batch, batch_format="pyarrow", zero_copy_batch=True)


# deterministic decomposed-Unicode suffix planted on doc_id % 4 == 0
# (the corpus is ASCII; the injector exercises the NFC path end to end
# — same derived-view convention as the mojibake check and the
# line-dedup boilerplate): 'Cafe'+COMBINING ACUTE, 'nai'+DIAERESIS+'ve'
_NFC_SUFFIX = " Cafe\u0301 nai\u0308ve"


def nfc_normalize_batch(batch: pa.Table) -> pa.Table:
    """Unicode NFC normalization (the standard first step before
    tokenization/hashing so visually-identical strings dedup and match
    consistently): per doc emit (text_nfc, changed, n_chars_in,
    n_chars_nfc). ASCII rows skip the normalize call entirely (one
    vectorized Arrow ascii check per batch) — on real web text the
    non-ASCII fraction pays, the rest streams through untouched."""
    import pyarrow.compute as pc
    import unicodedata
    ids = batch.column("doc_id").to_pylist()
    texts = [(t or "") + (_NFC_SUFFIX if d % 4 == 0 else "")
             for d, t in zip(ids, batch.column("text").to_pylist())]
    arr = pa.array(texts, pa.string())
    ascii_mask = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    out = [t if a else unicodedata.normalize("NFC", t)
           for t, a in zip(texts, ascii_mask)]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_nfc": pa.array(out, pa.string()),
        "changed": pa.array([o != t for o, t in zip(out, texts)],
                            pa.bool_()),
        "n_chars_in": pa.array([len(t) for t in texts], pa.int64()),
        "n_chars_nfc": pa.array([len(o) for o in out], pa.int64())})


def q_nfc_normalize(sf_dir: str):
    """Stateless NFC pass over the injector-derived corpus view."""
    return documents_ds(sf_dir).map_batches(
        nfc_normalize_batch, batch_format="pyarrow",
        zero_copy_batch=True)


def filter_funnel(sf_dir: str, min_words: int = 50,
                  min_alpha: float = 0.5, min_stop: float = 0.02
                  ) -> pa.Table:
    """Curation funnel report: for each quality gate (the same gates
    ``curate_documents`` applies, same thresholds), how many docs fail
    it in isolation and how many survive the cascade up to and
    including it — the first thing anyone debugging a 100-TB curation
    run asks for. ONE stateless pass: each batch collapses to a
    single row of partial counters, partials tree-combine through a
    trivial aggregate (no row ever rides an exchange)."""
    ds = documents_ds(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_total = len(texts)
        f_words = f_alpha = f_stop = s1 = s2 = s3 = 0
        for t in texts:
            t = t or ""
            words = t.split()
            nw = len(words)
            n = len(t)
            alpha_r = (sum("A" <= c <= "Z" or "a" <= c <= "z"
                           for c in t) / n) if n else 0.0
            stop_r = (sum(w.lower().strip(".,;:!?'\"()") in _STOPWORDS
                          for w in words) / nw) if nw else 0.0
            pw, pA, ps = (nw >= min_words, alpha_r >= min_alpha,
                          stop_r >= min_stop)
            f_words += not pw
            f_alpha += not pA
            f_stop += not ps
            s1 += pw
            s2 += pw and pA
            s3 += pw and pA and ps
        return pa.table({k: pa.array([v], pa.int64()) for k, v in (
            ("n_total", n_total), ("f_words", f_words),
            ("f_alpha", f_alpha), ("f_stop", f_stop),
            ("s1", s1), ("s2", s2), ("s3", s3))})

    import numpy as np
    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    tot = {c: 0 for c in ("n_total", "f_words", "f_alpha", "f_stop",
                          "s1", "s2", "s3")}
    for t in parts:
        for c in tot:
            tot[c] += int(np.sum(
                t.column(c).to_numpy(zero_copy_only=False)))
    return pa.table({
        "stage": pa.array(["input", "min_words", "min_alpha",
                           "min_stop"], pa.string()),
        "n_failed": pa.array([0, tot["f_words"], tot["f_alpha"],
                              tot["f_stop"]], pa.int64()),
        "n_surviving": pa.array([tot["n_total"], tot["s1"], tot["s2"],
                                 tot["s3"]], pa.int64()),
    })


def curate_documents(sf_dir: str, min_words: int = 50,
                     min_alpha: float = 0.5, min_stop: float = 0.02):
    """Training-corpus curation: quality-filter then exact-dedup in ONE
    pass shape — per-batch metric computation + in-batch filter (rows
    drop before the shuffle), then a groupby on the 32-char md5 only.
    Returns kept (doc_id = min id per distinct text, n_words), the
    standard quality-gate + dedup step of an LLM data pipeline."""
    ds = documents_ds(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_id, out_t, out_nw = [], [], []
        for i, t in zip(ids, texts):
            t = t or ""
            words = t.split()
            nw = len(words)
            n = len(t)
            if nw < min_words or n == 0:
                continue
            alpha = sum("A" <= c <= "Z" or "a" <= c <= "z" for c in t)
            stop = sum(w.lower().strip(".,;:!?'\"()") in _STOPWORDS
                       for w in words)
            if alpha / n < min_alpha or stop / nw < min_stop:
                continue
            out_id.append(i)
            out_t.append(t)
            out_nw.append(nw)
        from risjbot_ray.functions.digests import bucket_of, md5_pack
        hs = md5_pack(out_t)  # the shared engine-wide digest convention
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "h_hi": pa.array(hs[:, 0], pa.int64()),
                         "h_lo": pa.array(hs[:, 1], pa.int64()),
                         "hb": pa.array(bucket_of(hs[:, 0]),
                                        pa.int64()),
                         "n_words": pa.array(out_nw, pa.int64())})

    def reduce_bucket(df):
        import pandas as pd
        # the digest rides as two int64 columns bucketed on hb (string
        # md5 keys sort pathologically in the exchange); one vectorized
        # groupby per bucket resolves min-id / max-words per digest
        g = df.groupby(["h_hi", "h_lo"], sort=False)
        out = pd.DataFrame({"doc_id": g["doc_id"].min(),
                            "n_words": g["n_words"].max()})
        return out.reset_index(drop=True)

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    return (_coalesce_for_exchange(
                ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True))
            .groupby("hb")
            .map_groups(reduce_bucket, batch_format="pandas")
            .select_columns(["doc_id", "n_words"]))


def corpus_token_stats(sf_dir: str):
    """One-row corpus summary (n_docs, total_words, total_bpeish_tokens):
    per-batch PARTIAL sums inside map_batches, then a tiny global sum —
    the pre-aggregation pattern; no row-level data ever shuffles."""
    ds = documents_ds(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nw = sum(len((t or "").split()) for t in texts)
        nb = sum(len(_BPEISH_RE.findall(t or "")) for t in texts)
        return pa.table({"n_docs": pa.array([len(texts)], pa.int64()),
                         "words": pa.array([nw], pa.int64()),
                         "bpeish": pa.array([nb], pa.int64())})

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("words", alias_name="total_words"),
                      Sum("bpeish", alias_name="total_bpeish_tokens")))
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in sorted(agg.items())})


# --------------------------------------------------------------------------
# PII scrubbing (training-data redaction: emails / IPv4 / phone numbers)
# --------------------------------------------------------------------------

# RE2-compatible patterns (pyarrow.compute and DuckDB both run RE2, so the
# Ray stage and the SQL oracle redact identical spans)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Redact emails → <EMAIL>, IPv4s → <IP>, phones → <PHONE> (in that
    order), returning per-doc match counts + the scrubbed text. Fully
    vectorized: three RE2 kernels over the Arrow string column."""
    import pyarrow.compute as pc
    texts = batch.column("text")
    n_emails = pc.count_substring_regex(texts, PII_EMAIL)
    n_ips = pc.count_substring_regex(texts, PII_IPV4)
    n_phones = pc.count_substring_regex(texts, PII_PHONE)
    clean = pc.replace_substring_regex(texts, PII_EMAIL,
                                       replacement="<EMAIL>")
    clean = pc.replace_substring_regex(clean, PII_IPV4,
                                       replacement="<IP>")
    clean = pc.replace_substring_regex(clean, PII_PHONE,
                                       replacement="<PHONE>")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_emails": pc.cast(n_emails, pa.int64()),
                     "n_ips": pc.cast(n_ips, pa.int64()),
                     "n_phones": pc.cast(n_phones, pa.int64()),
                     "clean_text": clean})


def inject_pii_batch(batch: pa.Table) -> pa.Table:
    """Deterministically append doc_id-derived PII to each document —
    test scaffolding so the scrubber provably bites on a corpus that
    carries none; the arithmetic is plain integer ops an ANSI-SQL
    oracle reproduces verbatim."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = [
        f"{t or ''} Contact user{d}@mail.example.org or "
        f"10.{d % 200}.{(d * 7) % 200}.{d % 250} tel "
        f"{d % 900 + 100}-{(d * 3) % 900 + 100}-{(d * 7) % 9000 + 1000}."
        for d, t in zip(ids, texts)
    ]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "text": pa.array(out, pa.string())})


# Blocklist categories (C4-style bad-words gate, configurable). The
# defaults use corpus-vocabulary terms so the gate provably bites on
# the synthetic tables; a real deployment swaps in its word lists.
BLOCKLIST: dict[str, tuple[str, ...]] = {
    "engine": ("spark", "flink"),
    "shuffle": ("sort", "merge"),
}


def blocklist_filter_batch(batch: pa.Table,
                           blocklist=None) -> pa.Table:
    """C4-style blocklist gate: per doc, whole-word case-insensitive
    match counts for each category plus the keep flag (C4 drops a doc
    containing ANY listed term). One compiled RE2 alternation kernel
    per category over the Arrow string column — vectorized, zero
    shuffle, and byte-identical to a DuckDB `regexp_extract_all` on
    the same pattern (both engines are RE2)."""
    import pyarrow.compute as pc
    bl = BLOCKLIST if blocklist is None else blocklist
    low = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    out = {"doc_id": batch.column("doc_id")}
    total = np.zeros(batch.num_rows, dtype=np.int64)
    for cat, words in bl.items():
        pat = r"\b(?:" + "|".join(re.escape(w) for w in words) + r")\b"
        n = pc.cast(pc.count_substring_regex(low, pat),
                    pa.int64()).to_numpy(zero_copy_only=False)
        out[f"n_{cat}"] = pa.array(n, pa.int64())
        total += n
    out["n_blocked_total"] = pa.array(total, pa.int64())
    out["keep"] = pa.array(total == 0)
    return pa.table(out)


def q_blocklist(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        blocklist_filter_batch, batch_format="pyarrow",
        zero_copy_batch=True)


@ray.remote(num_cpus=1)
class _LogregShard:
    """One shard of the materialized feature table, pinned in worker
    heap for the whole fit: blocks are fetched once (zero-copy from
    the object store) and standardized once, so each GD iteration is
    one tiny RPC per shard returning (d+2)-double partials per block
    — no per-iteration Dataset execution. One partial per BLOCK:
    gradient X^T(p - y), summed log-loss, and n — (d+2) doubles
    keyed by ``bid`` (min doc_id) for the driver's deterministic
    bid-ordered summation."""

    def __init__(self, block_refs: list):
        tables = ray.get(list(block_refs))
        self._blocks: list[tuple[int, np.ndarray, np.ndarray]] = []
        for t in tables:
            if t.num_rows == 0:
                continue
            x = np.stack(t.column("x").to_numpy(zero_copy_only=False))
            y = t.column("y").to_numpy(
                zero_copy_only=False).astype(np.float64)
            bid = int(t.column("doc_id").to_numpy(
                zero_copy_only=False).min())
            self._blocks.append((bid, x, y))
        self._xs: list[tuple[int, np.ndarray, np.ndarray]] | None = None

    def stats(self):
        return [(bid, float(len(y)), x.sum(axis=0), (x * x).sum(axis=0))
                for bid, x, y in self._blocks]

    def set_norm(self, mu: np.ndarray, sd: np.ndarray):
        self._xs = []
        for bid, x, y in self._blocks:
            xs = (x - mu) / sd
            xs[:, 0] = 1.0                           # bias untouched
            self._xs.append((bid, xs, y))
        self._blocks = []                            # free the raw copy

    def grad(self, w: np.ndarray):
        eps = 1e-12
        out = []
        for bid, xs, y in self._xs:
            p = 1.0 / (1.0 + np.exp(-(xs @ w)))
            loss = -np.sum(y * np.log(p + eps)
                           + (1.0 - y) * np.log(1.0 - p + eps))
            out.append((bid, float(len(y)), float(loss),
                        xs.T @ (p - y)))
        return out

    def accuracy(self, w: np.ndarray):
        n = nc = npos = 0
        for _, xs, y in self._xs:
            pred = (xs @ w) > 0.0
            n += len(y)
            nc += int((pred == (y == 1)).sum())
            npos += int((y == 1).sum())
        return (n, nc, npos)


_LOGREG_SHARD_BYTES = 32 << 20


def _spawn_logreg_shards(feat_ds) -> list:
    """Fan the materialized feature blocks over shard actors (strided
    assignment keeps shard sizes even). Pool size scales with the
    FEATURE TABLE's bytes (~32 MB of standardized doubles per shard),
    capped at cluster CPUs: tiny corpora get one actor (spawning a
    full-width pool costs more than the fit), 100 TB corpora saturate
    the cluster."""
    refs = feat_ds.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    size = feat_ds.size_bytes() or 0
    want = max(1, -(-size // _LOGREG_SHARD_BYTES))
    k = max(1, min(len(refs), cpus, want))
    return [_LogregShard.remote(refs[i::k]) for i in range(k)]


def _logreg_fit(feat_ds, d: int, iters: int, lr: float,
                _workers: list | None = None):
    """Distributed full-batch logistic regression over a (doc_id, x:
    list<double>[d], y) Dataset. The feature table is loaded ONCE into
    a shard-actor pool; every iteration is one RPC round collecting
    (d+2)-double partials per block — the driver holds only w, mu, sd
    and sums partials in deterministic bid order. Feature
    standardization stats come from the same partial pattern. Returns
    (w, mu, sd, losses) with losses the mean log-loss per iteration.
    Pass `_workers` (from `_spawn_logreg_shards`) to reuse the pool
    for follow-up passes (e.g. accuracy); the caller then owns
    `ray.kill` cleanup."""
    own = _workers is None
    workers = _spawn_logreg_shards(feat_ds) if own else _workers
    try:
        stat_rows = sorted(
            (r for part in ray.get([wk.stats.remote() for wk in workers])
             for r in part), key=lambda r: r[0])
        if not stat_rows:
            raise ValueError("_logreg_fit: empty feature dataset")
        n = sum(r[1] for r in stat_rows)
        s = np.sum([r[2] for r in stat_rows], axis=0)
        ss = np.sum([r[3] for r in stat_rows], axis=0)
        mu = s / n
        var = np.maximum(ss / n - mu * mu, 1e-12)
        sd = np.sqrt(var)
        mu[0], sd[0] = 0.0, 1.0                      # bias column
        ray.get([wk.set_norm.remote(mu, sd) for wk in workers])

        w = np.zeros(d, dtype=np.float64)
        losses = []
        for _ in range(iters):
            rows = sorted(
                (r for part in ray.get(
                    [wk.grad.remote(w) for wk in workers])
                 for r in part), key=lambda r: r[0])
            g = np.sum([r[3] for r in rows], axis=0)
            loss = sum(r[2] for r in rows) / n
            losses.append(float(loss))
            w = w - lr * g / n
        return w, mu, sd, losses
    finally:
        if own:
            for wk in workers:
                ray.kill(wk)


def quality_classifier(sf_dir: str, iters: int = 40,
                       lr: float = 1.0,
                       min_words: int = 50) -> pa.Table:
    """Train a logistic-regression quality classifier — the GPT-3/
    LLaMA-pipeline stage that distills a hand-written quality rule
    into a model. Features are the quality_batch signals; labels are
    the curate_documents gate (n_words >= min_words, alpha_ratio >=
    0.5, stopword_ratio >= 0.02), so the learnable signal is
    guaranteed and deterministic (pick ``min_words`` near the corpus
    median when the default gate would label one-sidedly).

    Scale shape: text is featurized ONCE into a materialized 8-double
    feature table (~0.6% of corpus bytes), which is then pinned in a
    shard-actor pool for the whole fit; every GD iteration and the
    accuracy pass are one RPC round collecting (d+2)-double partials
    per block — the driver holds the weight vector and sums partials
    in deterministic bid order. No per-iteration Dataset execution
    (the r3 cost defect: ~0.9 s fixed overhead x 40 iterations).
    Returns one self-checking row: monotone loss, final accuracy vs
    the label base rate, and the learned weights."""
    d = 8

    def featurize(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        nw = q.column("n_words").to_numpy(zero_copy_only=False)
        al = q.column("alpha_ratio").to_numpy(zero_copy_only=False)
        st = q.column("stopword_ratio").to_numpy(zero_copy_only=False)
        y = ((nw >= min_words) & (al >= 0.5)
             & (st >= 0.02)).astype(np.int8)
        x = np.column_stack([
            np.ones(batch.num_rows),
            np.log1p(nw.astype(np.float64)),
            q.column("mean_word_len").to_numpy(zero_copy_only=False),
            al,
            q.column("digit_ratio").to_numpy(zero_copy_only=False),
            q.column("punct_ratio").to_numpy(zero_copy_only=False),
            st,
            q.column("ends_with_punct").to_numpy(
                zero_copy_only=False).astype(np.float64),
        ])
        return pa.table({"doc_id": q.column("doc_id"),
                         "x": pa.array(list(x), pa.list_(pa.float64())),
                         "y": pa.array(y, pa.int8())})

    # coalesce the tiny feature blocks (64 B/doc -> the input's block
    # count is far too fine): every GD pass pays per-task scheduling
    # for each block x iters times — measured 2.6x faster at 100k docs
    # after coalescing. At real scale the size target, not the count
    # floor, governs (webtext._coalesce keeps >= 2x-CPU blocks).
    from risjbot_ray.pipelines.webtext import _coalesce
    feats = _coalesce(            # returns materialized either way
        documents_ds(sf_dir)
        .map_batches(featurize, batch_format="pyarrow",
                     zero_copy_batch=True).materialize())
    workers = _spawn_logreg_shards(feats)
    try:
        w, mu, sd, losses = _logreg_fit(feats, d, iters, lr,
                                        _workers=workers)
        rows = ray.get([wk.accuracy.remote(w) for wk in workers])
    finally:
        for wk in workers:
            ray.kill(wk)
    n = sum(r[0] for r in rows)
    acc = sum(r[1] for r in rows) / n
    base = max(sum(r[2] for r in rows) / n,
               1.0 - sum(r[2] for r in rows) / n)
    mono = int(all(b <= a + 1e-12
                   for a, b in zip(losses, losses[1:])))
    out = {"n_docs": pa.array([n], pa.int64()),
           "loss_first": pa.array([round(losses[0], 6)], pa.float64()),
           "loss_final": pa.array([round(losses[-1], 6)],
                                  pa.float64()),
           "accuracy": pa.array([round(acc, 6)], pa.float64()),
           "base_rate": pa.array([round(base, 6)], pa.float64()),
           "loss_monotone": pa.array([mono], pa.int64()),
           "check_ok": pa.array(
               [int(mono and losses[-1] < losses[0]
                    and acc >= base)], pa.int64())}
    for i, name in enumerate(["bias", "log_words", "mean_wlen",
                              "alpha", "digit", "punct", "stop",
                              "endpunct"]):
        out[f"w_{name}"] = pa.array([round(float(w[i]), 6)],
                                    pa.float64())
    return pa.table(out)


# UTF-8 lead byte (as a mis-decoded char, U+00C2..U+00F4) followed by
# a continuation byte (U+0080..U+00BF): the signature of UTF-8 bytes
# decoded as Latin-1/cp1252 ("café" -> "cafÃ©"). RE2 prefilter so
# clean docs never reach the Python repair path.
# cp1252 maps bytes 0x80-0x9F to specials ('\u2014' -> '\u00e2\u20ac\u201d'
# puts U+20AC/U+201D after the lead char), so the continuation class
# must accept BOTH codecs' renderings or cp1252 mojibake never reaches
# the repair path. Built from the codec itself so it cannot drift.
_CP1252_CONT = "".join(sorted(
    bytes([b]).decode("cp1252") for b in range(0x80, 0xA0)
    if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)))  # unmapped in cp1252
MOJIBAKE_MARK = ("[\u00c2-\u00f4][\u0080-\u00bf"
                 + re.escape(_CP1252_CONT) + "]")


def _try_demojibake(s: str):
    """One round of strict double-encoding reversal: re-encode with
    the codec that produced the mojibake (latin-1, then cp1252 for
    the Windows variant) and strictly re-decode as UTF-8. Returns the
    repaired string or None. Strictness is the safety: clean accented
    text (a bare 'é') fails the UTF-8 decode and text with codepoints
    > U+00FF fails the encode, so neither is ever altered."""
    for enc in ("latin-1", "cp1252"):
        try:
            return s.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
    return None


def fix_mojibake_batch(batch: pa.Table) -> pa.Table:
    """Repair UTF-8-decoded-as-Latin-1/cp1252 mojibake (ftfy-style,
    single round). Vectorized RE2 marker prefilter; only flagged rows
    take the per-string repair path. Replaces ``text``, passes every
    other column through, and adds an int8 ``repaired`` flag."""
    import pyarrow.compute as pc
    texts = batch.column("text")
    flag = pc.match_substring_regex(texts, MOJIBAKE_MARK).to_numpy(
        zero_copy_only=False)
    out = texts.to_pylist()
    repaired = np.zeros(len(out), dtype=np.int8)
    for i in np.flatnonzero(flag):
        fixed = _try_demojibake(out[i])
        if fixed is not None:
            out[i] = fixed
            repaired[i] = 1
    cols = {name: batch.column(name) for name in batch.column_names
            if name != "text"}
    cols["text"] = pa.array(out, pa.string())
    cols["repaired"] = pa.array(repaired, pa.int8())
    return pa.table(cols)


def q_mojibake_check(sf_dir: str) -> pa.Table:
    """Driver-visible self-check for the mojibake repairer: append a
    deterministic non-ASCII suffix to every doc, corrupt doc_id%3==0
    via the utf-8→latin-1 round trip and doc_id%3==1 via the cp1252
    variant (both real-web corruption modes), repair, and compare
    against the pre-corruption text in-batch. Only O(1) counter rows
    reach the driver; expected row: n_repaired == n_corrupted,
    n_mismatch == 0 (every corrupted doc restored byte-for-byte AND
    no clean doc altered)."""
    def inject_and_corrupt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        orig, noisy = [], []
        for d, t in zip(ids, texts):
            s = f"{t or ''} café №{d} — naïve côté"
            orig.append(s)
            if d % 3 == 0:
                noisy.append(s.encode("utf-8").decode("latin-1"))
            elif d % 3 == 1:
                # cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D unmapped, so a
                # doc containing a char whose UTF-8 bytes include them
                # (e.g. 'Á' = C3 81) can't take this corruption mode —
                # fall back to the latin-1 variant (always decodable,
                # still repaired) so the injector never crashes on
                # realistic non-ASCII corpora; n_corrupted accounting
                # (ids % 3 != 2) is unchanged.
                try:
                    noisy.append(s.encode("utf-8").decode("cp1252"))
                except UnicodeDecodeError:
                    noisy.append(s.encode("utf-8").decode("latin-1"))
            else:
                noisy.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "orig": pa.array(orig, pa.string()),
                         "text": pa.array(noisy, pa.string())})

    def counters(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(),
                         dtype=np.int64)
        fixed = batch.column("text").to_pylist()
        orig = batch.column("orig").to_pylist()
        rep = batch.column("repaired").to_numpy(zero_copy_only=False)
        mism = np.array([a != b for a, b in zip(fixed, orig)])
        return pa.table({
            "n_docs": pa.array([len(ids)], pa.int64()),
            "n_corrupted": pa.array([int((ids % 3 != 2).sum())],
                                    pa.int64()),
            "n_repaired": pa.array([int(rep.sum())], pa.int64()),
            "n_mismatch": pa.array([int(mism.sum())], pa.int64()),
        })

    parts = (documents_ds(sf_dir)
             .map_batches(inject_and_corrupt, batch_format="pyarrow",
                          zero_copy_batch=True)
             .map_batches(fix_mojibake_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
             .map_batches(counters, batch_format="pyarrow",
                          zero_copy_batch=True)
             .to_arrow_refs())
    import ray as _ray
    tot = {"n_docs": 0, "n_corrupted": 0, "n_repaired": 0,
           "n_mismatch": 0}
    for t in _ray.get(parts):
        if t.num_rows:
            for k in tot:
                tot[k] += int(t.column(k).to_numpy().sum())
    tot["check_ok"] = int(tot["n_repaired"] == tot["n_corrupted"]
                          and tot["n_mismatch"] == 0)
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in tot.items()})


def q_pii_scrub(sf_dir: str):
    return (documents_ds(sf_dir)
            .map_batches(inject_pii_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(pii_scrub_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


# --------------------------------------------------------------------------
# repetition scoring (Gopher-style duplicate-token fractions)
# --------------------------------------------------------------------------

def repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals: dup_word_frac = 1 - unique/total
    whitespace tokens, top_word_frac = most-frequent-token count /
    total. Exact int/int doubles (same convention as quality_batch) so
    a SQL oracle computing the same counts hashes identically."""
    texts = batch.column("text").to_pylist()
    dup, top = [], []
    for t in texts:
        toks = t.split() if t else []
        n = len(toks)
        if n == 0:
            dup.append(0.0)
            top.append(0.0)
            continue
        _, counts = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
        dup.append(1.0 - len(counts) / n)
        top.append(int(counts.max()) / n)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "dup_word_frac": pa.array(dup, pa.float64()),
                     "top_word_frac": pa.array(top, pa.float64())})


def q_repetition(sf_dir: str):
    return documents_ds(sf_dir).map_batches(
        repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# fixed-window chunking (doc -> training-context-sized token windows)
# --------------------------------------------------------------------------

def chunk_batch(batch: pa.Table, window: int = 64) -> pa.Table:
    """Explode each doc into fixed-size whitespace-token windows
    (flat_map shape: one input row -> ceil(n_tokens/window) output
    rows). Emits token offsets plus the window's text so a downstream
    tokenizer consumes bounded inputs."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_id, o_ch, o_s, o_e, o_t = [], [], [], [], []
    for d, t in zip(ids, texts):
        toks = t.split() if t else []
        for ci in range(0, max(1, -(-len(toks) // window))):
            if not toks and ci == 0:
                o_id.append(d); o_ch.append(0)
                o_s.append(0); o_e.append(0); o_t.append("")
                continue
            s, e = ci * window, min((ci + 1) * window, len(toks))
            o_id.append(d); o_ch.append(ci)
            o_s.append(s); o_e.append(e)
            o_t.append(" ".join(toks[s:e]))
    return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                     "chunk_id": pa.array(o_ch, pa.int64()),
                     "token_start": pa.array(o_s, pa.int64()),
                     "token_end": pa.array(o_e, pa.int64()),
                     "chunk_text": pa.array(o_t, pa.string())})


def q_chunks(sf_dir: str, window: int = 64):
    return documents_ds(sf_dir).map_batches(
        lambda b: chunk_batch(b, window), batch_format="pyarrow",
        zero_copy_batch=True)


# --------------------------------------------------------------------------
# training-sequence stream packing (concatenate-and-cut at context size)
# --------------------------------------------------------------------------

def pack_stream(sf_dir: str, context: int = 1024,
                bucket_size: int = 100_000):
    """GPT-style sequence packing: documents are concatenated in doc_id
    order and cut into ``context``-token training sequences; each doc is
    assigned its global token offset, first/last sequence index and
    offset within its first sequence.

    Distributed prefix-sum shape (the driver never sees rows): docs
    bucket by ``doc_id // bucket_size``; pass 1 computes per-bucket
    token sums (tiny groupby — one row per bucket), the driver turns
    those into bucket BASE offsets (O(#buckets) memory) and broadcasts
    them; pass 2 computes each doc's offset locally as bucket base +
    within-bucket cumsum (``map_groups`` per bucket, sorted by doc_id).
    At 10^10 docs the driver holds 10^5 bucket offsets, nothing else."""
    import pyarrow.compute as pc

    toks = (documents_ds(sf_dir)
            .map_batches(tokencount_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(
        lambda b: b.select(["doc_id", "n_ws_tokens"]).append_column(
            "bucket", pc.divide(b.column("doc_id"), bucket_size)),
        batch_format="pyarrow"))
    toks = toks.materialize()

    from ray.data.aggregate import Sum
    bucket_sums = (toks.groupby("bucket")
                   .aggregate(Sum("n_ws_tokens", alias_name="n"))
                   .to_pandas().sort_values("bucket"))
    bases, run = {}, 0
    for _, r in bucket_sums.iterrows():
        bases[int(r["bucket"])] = run
        run += int(r["n"])
    base_ref = ray.put(bases)

    def assign(df):
        import pandas as pd  # noqa: F401  (map_groups hands us pandas)
        df = df.sort_values("doc_id")
        b = ray.get(base_ref)
        n = df["n_ws_tokens"].to_numpy()
        off = (b[int(df["bucket"].iloc[0])]
               + np.concatenate(([0], np.cumsum(n)[:-1])))
        last = np.where(n > 0, (off + n - 1) // context, off // context)
        return df.assign(
            token_offset=off.astype(np.int64),
            seq_first=(off // context).astype(np.int64),
            seq_last=last.astype(np.int64),
            offset_in_seq=(off % context).astype(np.int64),
        )[["doc_id", "n_ws_tokens", "token_offset", "seq_first",
           "seq_last", "offset_in_seq"]].rename(
            columns={"n_ws_tokens": "n_tokens"})

    return toks.groupby("bucket").map_groups(assign)

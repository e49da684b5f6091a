"""Frontier canonicalization: per-site URL normalizers + equivalent-domain
rewrite + fingerprint/hash/host columns.

Ordering matches the reference's middleware chain: per-site normalization
happens at request creation (e.g. dailymail query strip,
spiders/uk/dailymail.py:16-20), EquivalentDomains(900) rewrites BEFORE
RefetchControl(800) keys the URL (settings.py:121-124) — so ledger keys are
always canonical. Trawled URLs are stored canonical and must NOT be
re-normalized (refetchcontrol.py:205-212 bypass; SURVEY.md 7.4 item 7):
callers pass ``skip_normalize=True`` for trawl waves.

Pure Arrow-batch-in / Arrow-batch-out — usable both driver-side for small
waves and as a ``map_batches`` stage for large ones.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..extract.siterules import rules_for_host
from ..functions.urlnorm import (DEFAULT_EQUIVALENT_DOMAINS,
                                 apply_equivalent_domains, host_of,
                                 url_fingerprint)


def canonicalize_batch(batch: pa.Table,
                       equivalent_domains: dict[str, str] | None = None,
                       skip_normalize: bool = False) -> pa.Table:
    """Adds canon_url, host, url_hash, key, pass_seen columns to frontier
    rows (expects url, meta columns; meta is the JSON blob)."""
    eq = (equivalent_domains if equivalent_domains is not None
          else DEFAULT_EQUIVALENT_DOMAINS)
    urls = batch.column("url").to_pylist()
    metas = (batch.column("meta").to_pylist()
             if "meta" in batch.column_names else [None] * len(urls))
    kinds = (batch.column("source_kind").to_pylist()
             if "source_kind" in batch.column_names
             else ["article"] * len(urls))

    canon, hosts, keys, hashes, passes, trawled = [], [], [], [], [], []
    for u, m, kind in zip(urls, metas, kinds):
        meta = json.loads(m) if m else {}
        trawled.append(bool(meta.get("refetchcontrol_trawled")))
        if skip_normalize or meta.get("refetchcontrol_trawled"):
            cu = u  # trawled URLs are already canonical — do not reapply
        else:
            # site url normalizers apply to page requests only (the
            # reference's url_to_request overrides, e.g. dailymail
            # parse_node query strip), never to sitemap/feed fetches
            cu = u
            if kind in ("article", "link"):
                h = host_of(u)
                norm = rules_for_host(h).url_normalizer
                cu = norm(u) if norm else u
            cu = apply_equivalent_domains(cu, eq)
        canon.append(cu)
        hosts.append(host_of(cu))
        fp = url_fingerprint(cu)
        keys.append(fp)
        hashes.append(int.from_bytes(fp[:8], "big"))
        passes.append(bool(meta.get("refetchcontrol_pass")))

    out = batch
    for name, arr in (
            ("canon_url", pa.array(canon, type=pa.string())),
            ("host", pa.array(hosts, type=pa.string())),
            ("url_hash", pa.array(np.array(hashes, dtype=np.uint64))),
            ("key", pa.array(keys, type=pa.binary())),
            ("pass_seen", pa.array(passes, type=pa.bool_())),
            ("trawled", pa.array(trawled, type=pa.bool_()))):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def dedupe_wave(table: pa.Table) -> pa.Table:
    """Exact in-wave dedup by ledger key, deterministic winner =
    (priority desc, canon_url asc) — folds the Scrapy in-run dupefilter
    (SURVEY.md 2.4 T5) into a groupby-first.

    Arrow-native: one stable sort + a duplicated-mask over the key column
    only; the wide columns (meta blobs) never round-trip through pandas.
    """
    if table.num_rows == 0:
        return table
    import pyarrow.compute as pc

    idx = pc.sort_indices(table, sort_keys=[("priority", "descending"),
                                            ("canon_url", "ascending")])
    table = table.take(idx)
    import pandas as pd

    keys = pd.Series(table.column("key").to_pylist())
    keep = ~keys.duplicated(keep="first")
    return table.filter(pa.array(keep.to_numpy()))

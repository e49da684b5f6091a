"""risjbot_ray — a Ray-Data-native news-crawl / web-text processing engine.

A from-scratch rebuild of the data-processing capabilities of pmyteh/RISJbot
(reference at /root/reference, a Scrapy project) on top of ray.data Datasets:

- URL frontier + fetch scheduler (sharded bloom/cuckoo URL-seen actor pool,
  per-host politeness budgets, robots.txt gate, priority scheduling) —
  SURVEY.md section 2.1 / 2.4.
- Per-site metadata-ensemble extraction over zero-copy Arrow html columns —
  reference RISJbot/loaders.py:140-423, reimplemented as stateless
  map_batches stages (SURVEY.md section 2.3).
- Enrichment actor pools (sentiment, reading age, named people, wordcount) —
  reference RISJbot/pipelines/*.py.
- Training-data operators: dedup (exact/minhash/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal plumbing.

No code is copied from the reference; all transforms are reimplemented on
stdlib + pyarrow + pandas + numpy + ray.
"""

__version__ = "0.1.0"

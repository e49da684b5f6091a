"""Local reference implementation of minhash_dedup_incremental's
documented rule (same hash kernels, independent candidate-cap /
est-verify / union-find machinery) — shared by the pytest parity gate
and the driver-visible `minhash_incr_check` self-check row."""

from __future__ import annotations

import numpy as np


def incr_reference(shards: list[dict], num_perm=64, bands=16,
                    threshold=0.7):
    """Pure-local implementation of minhash_dedup_incremental's
    documented rule over a sequence of {doc_id: text} shards — same
    hash kernels, independent candidate/caps/cluster machinery."""
    from risjbot_ray.pipelines.dedup import (MinHasher, _shingle_hashes)
    rpb = num_perm // bands
    mh = MinHasher(num_perm=num_perm)
    kept_state: dict[int, np.ndarray] = {}      # prior kept: id -> sig
    results = []
    for shard in shards:
        sigs = {d: mh.signature(t or "") for d, t in shard.items()}
        sh = {d: _shingle_hashes(t or "") for d, t in shard.items()}
        # cross candidates per (band, chunk) collision, capped
        bucket: dict = {}
        for d, s in kept_state.items():
            for b in range(bands):
                bucket.setdefault(
                    (b, s[b * rpb:(b + 1) * rpb].tobytes()),
                    []).append(d)
        cand: dict[int, set] = {d: set() for d in shard}
        for d, s in sigs.items():
            for b in range(bands):
                key = (b, s[b * rpb:(b + 1) * rpb].tobytes())
                priors = sorted(bucket.get(key, []))[:8]
                cand[d].update(priors)
        dropped_prior = set()
        for d in shard:
            priors = sorted(cand[d])[:32]
            for p in priors:
                est = float((sigs[d] == kept_state[p]).mean())
                if est >= threshold:
                    dropped_prior.add(d)
                    break
        # within-shard: band collision + est >= min(0.5, t)
        # + exact >= t (the candidate gate never exceeds 0.5 so a
        # permissive threshold stays permissive, and tracks t below
        # 0.5 exactly like minhash_dedup_incremental's
        # minhash_candidate_pairs(threshold=min(0.5, t)) call)
        ids = sorted(shard)
        edges = []
        for i, a in enumerate(ids):
            for b_ in ids[i + 1:]:
                if a in dropped_prior or b_ in dropped_prior:
                    continue
                collide = any(
                    sigs[a][j * rpb:(j + 1) * rpb].tobytes()
                    == sigs[b_][j * rpb:(j + 1) * rpb].tobytes()
                    for j in range(bands))
                if not collide:
                    continue
                if float((sigs[a] == sigs[b_]).mean()) \
                        < min(0.5, threshold):
                    continue
                inter = len(np.intersect1d(sh[a], sh[b_]))
                uni = len(np.union1d(sh[a], sh[b_]))
                if uni and round(inter / uni, 5) >= threshold:
                    edges.append((a, b_))
        # components -> min rep
        parent = {d: d for d in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b_ in edges:
            ra, rb = find(a), find(b_)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        shard_dup = {d for d in ids
                     if d not in dropped_prior and find(d) != d}
        res = {}
        for d in ids:
            res[d] = ("prior_dup" if d in dropped_prior else
                      "shard_dup" if d in shard_dup else "kept")
            if res[d] == "kept":
                kept_state[d] = sigs[d]
        results.append(res)
    return results

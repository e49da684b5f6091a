"""Contract tests: @scrapes/@noscrapes field presence per site
(reference parse_page docstrings), gated on the hermetic fixtures."""

from risjbot_ray.extract.contracts import CONTRACTS
from risjbot_ray.extract.siterules import rules_for_url
from risjbot_ray.extract.stage import extract_batch
from risjbot_ray.testsupport.pagegen import gen_pages


def test_site_contracts_on_fixtures():
    pages, exp = gen_pages(600, seed=42)
    fams = {r["url"]: r["family"] for r in exp.to_pylist()}
    out = extract_batch(pages)
    checked = set()
    failures = []
    for row in out.to_pylist():
        if fams.get(row["url"]) != "bodyxpath":
            continue
        key = rules_for_url(row["url"]).key
        if key not in CONTRACTS:
            continue
        checked.add(key)
        scrapes, noscrapes = CONTRACTS[key]
        for f in scrapes:
            v = row.get(f)
            if v is None or v == "" or v == []:
                failures.append((key, "missing", f, row["url"]))
        for f in noscrapes:
            v = row.get(f)
            if not (v is None or v == "" or v == []):
                failures.append((key, "unexpected", f, row["url"]))
    assert not failures, failures[:8]
    # the fixture families must actually exercise a healthy number of
    # contracted sites
    assert len(checked) >= 10, checked

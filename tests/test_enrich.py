"""Enrichment stage tests (reference pipelines/*.py semantics)."""

import pyarrow as pa
import pytest

from risjbot_ray.enrich.stages import (Enrich, NamedPeople, ReadingAge,
                                       Sentiment, WordCount, count_syllables)


def tbl(*texts):
    return pa.table({"bodytext": pa.array(list(texts), pa.string())})


def test_wordcount_matches_split():
    out = WordCount()(tbl("one two  three", "", None))
    assert out.column("wordcount").to_pylist() == [3, 0, None]


def test_sentiment_averages_lexicon_hits():
    s = Sentiment()
    out = s(tbl("great success", "crisis failure fear", "neutral words only",
                None))
    pol = out.column("sentiment").to_pylist()
    assert pol[0] > 0.5
    assert pol[1] < -0.5
    assert pol[2] == 0.0
    assert pol[3] is None
    sub = out.column("subjectivity").to_pylist()
    assert 0 < sub[0] <= 1


def test_sentiment_deterministic():
    s = Sentiment()
    t = tbl("the good the bad and the excellent")
    a = s(t).column("sentiment").to_pylist()
    b = s(t).column("sentiment").to_pylist()
    assert a == b


@pytest.mark.parametrize("word,lo,hi", [
    ("cat", 1, 1), ("hello", 2, 2), ("beautiful", 3, 4),
    ("education", 4, 5), ("rhythm", 1, 2), ("made", 1, 1),
])
def test_syllable_heuristic_ranges(word, lo, hi):
    assert lo <= count_syllables(word) <= hi


def test_readingage_formulas():
    # one sentence, known syllables: "the cat sat" = 3 words, 3 syllables
    out = ReadingAge()(tbl("The cat sat."))
    fl = out.column("fleschreadingease").to_pylist()[0]
    ki = out.column("kincaidgradelevel").to_pylist()[0]
    # exact formulas (readingage.py:69-74): W/S=3, Syl/W=1
    assert fl == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1)
    assert ki == pytest.approx(0.39 * 3 + 11.8 * 1 - 15.59)


def test_readingage_empty_is_null():
    out = ReadingAge()(tbl("", None))
    assert out.column("fleschreadingease").to_pylist() == [None, None]


def test_namedpeople_finds_multiword_names():
    np_ = NamedPeople()
    people = np_.people(
        "John Smith met Jane Doe in London yesterday. "
        "Later, Smith spoke with Dr Brown about the deal. "
        "The Economy grew faster.")
    assert "John Smith" in people
    assert "Jane Doe" in people
    assert "Brown" in people  # honorific-triggered single surname
    assert "The Economy" not in people


def test_namedpeople_repeat_mentions_repeat():
    people = NamedPeople().people(
        "Alice Jones said so. Later Alice Jones denied it.")
    assert people.count("Alice Jones") == 2


def test_enrich_composes_in_order(ray_session):
    import ray
    t = tbl("The great John Smith won a huge success.",
            "A crisis of failure and loss.")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(Enrich, batch_format="pyarrow",
                         fn_constructor_kwargs={"namedpeople": True,
                                                "readingage": True},
                         concurrency=1).take_all()
    assert out[0]["wordcount"] == 8
    assert out[0]["sentiment"] > 0
    assert out[1]["sentiment"] < 0
    assert "John Smith" in out[0]["namedpeople"]
    assert out[0]["fleschreadingease"] is not None

"""Embedded sentiment lexicon (TextBlob/pattern replacement).

The reference's Sentiment pipeline (pipelines/sentiment.py:16-23) scores
``bodytext`` with TextBlob, whose en-sentiment lexicon maps words to
(polarity, subjectivity) and averages over matches. That lexicon is not
available offline; this is a small from-scratch lexicon with the same
averaging contract — deterministic and sufficient for relative scoring.
Values are hand-assigned in [-1, 1] / [0, 1].
"""

# word -> (polarity, subjectivity)
SENTIMENT_LEXICON: dict[str, tuple[float, float]] = {
    # positive
    "good": (0.7, 0.6), "great": (0.8, 0.75), "excellent": (1.0, 1.0),
    "best": (1.0, 0.3), "better": (0.5, 0.5), "success": (0.6, 0.5),
    "successful": (0.6, 0.6), "win": (0.6, 0.4), "winning": (0.6, 0.5),
    "welcomed": (0.5, 0.4), "strong": (0.4, 0.5), "growth": (0.3, 0.2),
    "improve": (0.4, 0.4), "improved": (0.45, 0.45), "gain": (0.4, 0.3),
    "boost": (0.5, 0.4), "happy": (0.8, 1.0), "positive": (0.45, 0.7),
    "popular": (0.4, 0.6), "safe": (0.5, 0.5), "benefit": (0.5, 0.4),
    "support": (0.3, 0.3), "agree": (0.3, 0.4), "praised": (0.7, 0.7),
    "record": (0.2, 0.3), "hope": (0.4, 0.6), "calm": (0.3, 0.5),
    # negative
    "bad": (-0.7, 0.67), "worse": (-0.6, 0.6), "worst": (-1.0, 1.0),
    "fail": (-0.6, 0.5), "failed": (-0.6, 0.5), "failure": (-0.6, 0.5),
    "crisis": (-0.7, 0.6), "deficit": (-0.3, 0.3), "loss": (-0.4, 0.4),
    "lose": (-0.4, 0.4), "losing": (-0.4, 0.5), "weak": (-0.4, 0.5),
    "decline": (-0.4, 0.4), "drop": (-0.3, 0.3), "fear": (-0.6, 0.7),
    "concern": (-0.3, 0.5), "angry": (-0.7, 0.9), "risk": (-0.4, 0.5),
    "threat": (-0.6, 0.6), "warning": (-0.4, 0.5), "guilty": (-0.6, 0.7),
    "fraud": (-0.7, 0.6), "scandal": (-0.7, 0.8), "death": (-0.7, 0.4),
    "dead": (-0.7, 0.5), "killed": (-0.8, 0.6), "objections": (-0.3, 0.5),
    "negative": (-0.45, 0.7), "problem": (-0.4, 0.4), "dispute": (-0.3, 0.5),
    # neutral-but-subjective
    "lengthy": (-0.1, 0.4), "major": (0.1, 0.4), "huge": (0.2, 0.6),
    "controversial": (-0.2, 0.8), "surprising": (0.1, 0.9),
}

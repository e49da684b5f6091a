"""Per-site field contracts, transcribed from the reference's Scrapy
contract docstrings (``@scrapes`` / ``@noscrapes``; SURVEY.md section 5).

The reference runs these against the live web (`scrapy check`); here they
gate the hermetic per-site fixtures: for each site with a bodyxpath
fixture, the extracted item must contain every ``scrapes`` field that the
fixture plants, and none of the ``noscrapes`` fields.
"""

# site key -> (scrapes, noscrapes); citations are the parse_page
# docstrings, e.g. uk/bbc.py:19-24, us/nytimes.py:17-21
CONTRACTS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "guardian": (("bodytext", "fetchtime", "headline", "source", "url"),
                 ()),
    "bbc": (("bodytext", "fetchtime", "headline", "source", "url"),
            ("modtime", "keywords")),          # uk/bbc.py:23-24
    "nytimes": (("bodytext", "fetchtime", "headline", "source", "url"),
                ()),
    "cnn": (("bodytext", "fetchtime", "headline", "source", "url"), ()),
    "dailymail": (("bodytext", "fetchtime", "headline", "source", "url"),
                  ()),
    "washingtonpost": (("bodytext", "fetchtime", "headline", "source",
                        "url"), ("modtime",)),  # us/washingtonpost.py:22
    "foxnews": (("bodytext", "fetchtime", "headline", "source", "url"),
                ("keywords",)),                 # us/foxnews.py:22
    "telegraph": (("bodytext", "fetchtime", "headline", "url"),
                  ("modtime",)),                # uk/telegraph.py:22
    "yahoo": (("bodytext", "fetchtime", "headline", "source", "url"),
              ("modtime", "section")),          # us/yahoo.py:22-23
    "prnewswire": (("fetchtime", "headline", "source", "url"),
                   ("modtime", "section")),     # us/prnewswire.py:20-21
    "sun": (("bodytext", "fetchtime", "headline", "source", "url"), ()),
    "metro": (("bodytext", "fetchtime", "headline", "url"), ()),
    "mirror": (("bodytext", "fetchtime", "headline", "url"), ()),
    "cbs": (("bodytext", "fetchtime", "headline", "url"), ()),
    "nbc": (("bodytext", "fetchtime", "headline", "url"), ()),
    "reuters": (("bodytext", "fetchtime", "headline", "source", "url"),
                ()),
}

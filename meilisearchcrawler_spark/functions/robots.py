"""robots.txt evaluation (F5/S5) — full stdlib semantics.

The reference gates every pop with ``RobotFileParser.can_fetch``
over the host's fetched robots.txt, with a failed fetch meaning
allow-all (crawler.py:405-429). The engine evaluates the *same stdlib
parser* inside an Arrow-batched pandas UDF over the broadcast-joined
robots dimension — full User-agent group / Allow / Disallow semantics,
not a prefix-rule approximation — with a per-batch parser cache keyed
by robots.txt content so parsing is per-distinct-file, not per-URL.
The sequential oracle calls the identical helper, so engine↔oracle
parity is by construction and both match the reference's parser
behavior exactly (it IS the reference's parser).
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..config import USER_AGENT


def make_parser(robots_txt: str | None, allow_all: bool) -> RobotFileParser:
    """Parser for one host; allow_all models the failed-fetch fallback
    (crawler.py:424-427)."""
    p = RobotFileParser()
    if allow_all or robots_txt is None:
        p.allow_all = True
        return p
    p.parse(robots_txt.splitlines())
    return p


def can_fetch(robots_txt: str | None, allow_all: bool, url: str,
              agent: str = USER_AGENT) -> bool:
    return make_parser(robots_txt, allow_all).can_fetch(agent, url)


@F.pandas_udf(BooleanType())
def robots_denied_udf(url: pd.Series, robots_txt: pd.Series,
                      allow_all: pd.Series) -> pd.Series:
    """True iff robots deny the URL. Null robots_txt (host without a
    robots row) and allow_all both mean allowed."""
    cache: dict[str, RobotFileParser] = {}
    out = []
    for u, txt, aa in zip(url, robots_txt, allow_all):
        if (aa is not None and bool(aa)) or txt is None:
            out.append(False)
            continue
        parser = cache.get(txt)
        if parser is None:
            parser = make_parser(txt, False)
            cache[txt] = parser
        out.append(not parser.can_fetch(USER_AGENT, u))
    return pd.Series(out, dtype=bool)

"""Benign-URL corpus synthesis.

The reference snapshot ships a 47,875-line malicious training corpus but is
missing training/good.txt (FIXTURES.md §2; learning.scala:19 expects it), so
the benign side must be synthesized. This generator reproduces the benign
path styles observable in datasets/learning-datasets/testing/good.txt:
dictionary-word segments, word+digit suffixes, pure digit runs, random
letter runs, snake/kebab/concatenated compounds, date-dash tokens,
spaced phrases, `/javascript/<name>.<ext>` directory listings, and benign
`?param=http://host/…` redirect-style queries.

Seeded and deterministic: same (n, seed) → same corpus.
"""

from __future__ import annotations

import random

WORDS = (
    "news blog shop item user page article media img category archive post "
    "product search help about contact docs api static assets home view press "
    "index footer top nav room save check games alert logo release complain "
    "default examples sessions installation services information celebrity "
    "class mysql administrator menu operation site absolute path root dir inc "
    "shows cute file fuzzers personals spanish crawl content gifts sport urban "
    "jeans reader downloads warez issue carbon"
).split()

EXTS = (
    ".php .html .csv .dat .tgz .o .jsf .err .js .gif .jpg .pdf .txt .xml .sh "
    ".cpp .cfm .java .nsf .dll .ws .conf .xslt .bat .lib .php3 .jsp .cgi .pl "
    ".asp .ini .log .tar .zip .doc .nasl .inc .tcl .ida .exe .htm .css .class .vbs"
).split()

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _token(rng: random.Random) -> str:
    s = rng.random()
    if s < 0.18:
        return rng.choice(WORDS)
    if s < 0.30:
        return f"{rng.choice(WORDS)}{rng.randrange(100)}"
    if s < 0.42:
        return str(rng.randrange(10 ** rng.randint(3, 9)))
    if s < 0.54:
        return "".join(rng.choice(_ALPHA) for _ in range(rng.randint(2, 11)))
    if s < 0.62:
        return f"{rng.choice(WORDS)}_{rng.choice(WORDS)}"
    if s < 0.69:
        return f"{rng.choice(WORDS)}-{rng.choice(WORDS)}"
    if s < 0.78:
        return "".join(rng.choice(WORDS) for _ in range(rng.randint(2, 3)))
    if s < 0.86:
        return f"{rng.randrange(20060101, 20081231)}-{rng.randrange(9)}"
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 4)))


def _param(rng: random.Random) -> str:
    s = rng.random()
    if s < 0.4:
        return "_".join(rng.choice(WORDS) for _ in range(rng.randint(2, 4)))
    if s < 0.7:
        return rng.choice(WORDS) + rng.choice(WORDS)
    return rng.choice(["path", "url", "q", "root", "site", "id", "page"])


def synth_good_urls(n: int, seed: int = 7) -> list[str]:
    """n deterministic benign URL paths matching the holdout's styles."""
    rng = random.Random(seed)
    out: list[str] = []
    for _ in range(n):
        if rng.random() < 0.16:
            out.append(f"/javascript/{_token(rng)}{rng.choice(EXTS)}")
            continue
        depth = rng.randint(1, 2)
        path = "/" + "/".join(_token(rng) for _ in range(depth))
        r2 = rng.random()
        if r2 < 0.30:
            path += rng.choice(EXTS)
        elif r2 < 0.70:
            path += "/"
        if rng.random() < 0.12:
            if not path.endswith((".php", ".inc", "/")):
                path += ".php"
            host = (
                f"192.168.{rng.randrange(255)}.{rng.randrange(255)}:8080"
                if rng.random() < 0.6
                else f"www.{rng.choice(WORDS)}.org"
            )
            tok = "".join(rng.choice(_ALPHA + "0123456789") for _ in range(rng.randint(6, 14)))
            path += f"?{_param(rng)}=http://{host}/{tok}" + rng.choice(["?", "??", ""])
        out.append(path)
    return out

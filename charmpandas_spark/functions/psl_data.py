"""Packaged public-suffix rules (curated subset) + PSL text parser.

The Public Suffix List (publicsuffix.org — public data, Mozilla
Foundation, MPL-2.0) is the canonical answer to "what is the
registrable domain of this host?". The full list is ~10k rules and
~230 kB; shipping all of it verbatim is unnecessary for the engine —
what matters is (a) the LOOKUP ALGORITHM implemented faithfully
(normal / ``*.`` wildcard / ``!`` exception rules, longest-match,
exception-wins, default rule ``*``) and (b) an upgrade path where the
user drops in the full current list.

``PSL_RULES`` below is a curated ICANN-section subset covering the
high-traffic multi-label registries (the ones the last-two-labels
heuristic gets WRONG: ``*.co.uk``, ``*.com.au``, ``*.co.jp``, …),
the canonical wildcard TLDs, the ``!www.ck``-style exceptions that
exercise every branch of the algorithm, and a few common
private-section hosting suffixes (``github.io``, ``blogspot.com``).
Pass the full downloaded list through ``parse_psl_text`` to use it
instead — same plan, bigger broadcast (still < 1 MB).

Reference parity note: the charmpandas reference has no URL surface
at all; this module exists for the LLM-curation operator family.
"""

from __future__ import annotations

__all__ = ["PSL_RULES", "parse_psl_text"]


def parse_psl_text(text: str, icann_only: bool = False) -> list[str]:
    """Parse raw ``public_suffix_list.dat`` content into a rule list
    usable as the ``rules=`` argument throughout ``urls.py``: strips
    comments / blank lines, lower-cases, optionally stops at the end
    of the ICANN section (the private section lists hosting providers
    — usually wanted for corpus curation, sometimes not for cookie
    scoping)."""
    rules: list[str] = []
    in_private = False
    for line in text.splitlines():
        line = line.strip().lower()
        if "===begin private domains===" in line:
            in_private = True
        if not line or line.startswith("//"):
            continue
        if in_private and icann_only:
            continue
        rules.append(line)
    return rules


# Curated subset of the Public Suffix List (publicsuffix.org),
# ICANN section unless marked. Grouped by TLD for auditability.
PSL_RULES: tuple[str, ...] = (
    # --- uk ---
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # --- au ---
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    # --- jp (incl. the city wildcard/exception family: the PSL's
    # canonical exercise of every rule type) ---
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # --- br / cn / in / kr / za / nz / mx / ar / tr / il ---
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    # --- sg / hk / tw / th / id / ua / pl ---
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "my.id",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    # --- wildcard-only TLDs ---
    "*.bd", "*.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg",
    "!www.ck",
    # --- private section (hosting providers: each customer site is
    # its own "registrable domain" for curation purposes) ---
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "pages.dev",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
    "appspot.com", "wordpress.com",
)

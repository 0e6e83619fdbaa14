"""Property test for the regex-path walker (VERDICT r14 #9 stretch).

``sources.parquet._expand_regex_path`` mirrors the reference's
regex-path scan (src/partition.cpp:51-63) with one extension: the
regex may span directory levels, anchored by the longest literal
prefix. It has TWO physical branches — a cheap single-directory
listing for basename-only patterns, and an ``os.walk`` for
directory-spanning ones — and the r14 verdict asked for a property
pin of the prefix-split edge cases (escaped slashes, classes, a
pattern whose FIRST segment is regex).

The oracle here is a brute-force replay that NEVER takes the listdir
fast path: walk the whole tree under the same longest-literal-prefix
base and match relative paths with the same fullmatch-or-prefix-match
rule. Comparison is on the set of FILES ULTIMATELY READ — a returned
directory (the fast path can match a direct child dir, which Spark
reads recursively) is expanded to the files under it, which is
exactly what the scan does with it.
"""

import os
import re
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from charmpandas_spark.sources.parquet import (_REGEX_HINTS,
                                               _expand_regex_path)

# small closed alphabet of path segments: literals, near-miss
# literals, and names that regex pieces can match
_SEGMENTS = ["a", "b", "ab", "x1", "x2", "f.parquet"]

# pattern segments: literals, alternations, classes, quantifiers,
# dot-stars (cross "/" when fullmatching), escapes — including pieces
# WITHOUT any _REGEX_HINTS char (["[ab]", "x?"]: the whole path then
# passes through as a glob, pinned below) and pieces that make the
# FIRST segment regex (base == tree root).
_PAT_SEGMENTS = ["a", "b", "ab", ".*", "a.*", "(a|b)", "x(1|2)",
                 "a+", "[ab]", "x?", r"\w+", "f\\.parquet",
                 r"a\/b", "(x1|x2)",
                 # mid-/leading-wildcard pieces: these exercise the
                 # slash-free-vs-walk branch divergence the oracle's
                 # two-branch replay pins (r15 review finding)
                 ".*f", "(a|b)b", ".+1"]


def _files_under(path):
    """Every file at any depth under path (or {path} if it's a file)."""
    if os.path.isfile(path):
        return {path}
    out = set()
    for root, _dirs, files in os.walk(path):
        for f in files:
            out.add(os.path.join(root, f))
    return out


def _brute(base_root: str, pattern: str):
    """Spec replay of the DOCUMENTED contract with independent
    matching code: split on '/', literal segments before the first
    hint-bearing one anchor the base; a slash-free remaining pattern
    matches DIRECT CHILDREN of the base by name (a matched directory
    means 'Spark reads it' — expanded to its files here), a
    directory-spanning one matches every file's relative path under
    the base. Match rule both ways: fullmatch OR prefix-match."""
    parts = pattern.split("/")
    first_rx = next((i for i, p in enumerate(parts)
                     if _REGEX_HINTS.search(p)), len(parts) - 1)
    base = "/".join([base_root] + parts[:first_rx])
    rel_pat = "/".join(parts[first_rx:])
    try:
        rx = re.compile(rel_pat)
    except re.error:
        return None  # invalid regex: the function passes through
    out = set()
    if "/" not in rel_pat:
        try:
            names = os.listdir(base)
        except OSError:
            names = []
        for name in names:
            if rx.fullmatch(name) or rx.match(name):
                out |= _files_under(os.path.join(base, name))
        return out
    for root, _dirs, files in os.walk(base):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), base)
            if rx.fullmatch(rel) or rx.match(rel):
                out.add(os.path.join(base, rel))
    return out


@settings(max_examples=200, deadline=None)
@given(
    tree=st.lists(
        st.lists(st.sampled_from(_SEGMENTS), min_size=1, max_size=3),
        min_size=0, max_size=8),
    pat=st.lists(st.sampled_from(_PAT_SEGMENTS),
                 min_size=1, max_size=3),
    data=st.data())
def test_expand_regex_path_matches_walk_replay(tree, pat, data,
                                               tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rxwalk"))
    for rel_parts in tree:
        p = os.path.join(root, *rel_parts)
        try:  # a prior FILE may block a needed dir (or vice versa):
            # skip the conflicting entry, the tree stays valid
            os.makedirs(os.path.dirname(p), exist_ok=True)
            if not os.path.isdir(p):
                with open(p, "w") as fh:
                    fh.write("x")
        except OSError:
            pass
    pattern = "/".join(pat)
    path = os.path.join(root, pattern)

    if not _REGEX_HINTS.search(path):
        # no regex hint anywhere: pinned passthrough (Spark glob)
        assert _expand_regex_path(path) == path
        return

    expected = _brute(root, pattern)
    if expected is None:
        assert _expand_regex_path(path) == path  # invalid regex
        return
    try:
        got = _expand_regex_path(path)
    except FileNotFoundError:
        got = []
    assert isinstance(got, (list, str))
    got_files = set()
    for m in (got if isinstance(got, list) else [got]):
        got_files |= _files_under(m)
    assert got_files == expected, (pattern, sorted(got_files),
                                   sorted(expected))


def test_expand_regex_path_first_segment_regex(tmp_path):
    # pattern whose FIRST segment is regex: base is the tree root
    root = tmp_path
    (root / "a1").mkdir()
    (root / "a2").mkdir()
    (root / "a1" / "f.parquet").write_text("x")
    (root / "a2" / "f.parquet").write_text("x")
    (root / "b1").mkdir()
    (root / "b1" / "f.parquet").write_text("x")
    got = _expand_regex_path(str(root) + r"/a(1|2)/f\.parquet")
    assert got == [str(root / "a1" / "f.parquet"),
                   str(root / "a2" / "f.parquet")]


def test_expand_regex_path_escaped_slash(tmp_path):
    # an escaped slash inside the pattern splits into a segment
    # ending in a backslash — which carries a hint char, so the walk
    # anchors BEFORE it and the compiled r'a\/b' still means 'a/b'
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "b").write_text("x")
    got = _expand_regex_path(str(tmp_path) + r"/a\/b")
    assert got == [str(tmp_path / "a" / "b")]

"""Aho-Corasick differential tests vs the str.count reference."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_ray.functions.multisearch import AhoCorasick


def ref_counts(text: str, patterns: list[str]) -> list[int]:
    return [text.count(p) for p in patterns]


def test_basic_overlap_semantics():
    ac = AhoCorasick(["aa", "ab", "aba"])
    assert ac.count_nonoverlapping("aaaa") == [2, 0, 0]  # str.count("aaaa","aa")==2
    assert ac.count_nonoverlapping("ababab") == [0, 3, 1]
    assert ac.count_nonoverlapping("") == [0, 0, 0]


def test_blocklist_phrases_match_reference():
    pats = ["value table", "fast merge", "slow scan", "big join"]
    text = "the value table meets a fast merge then value table value table big join"
    ac = AhoCorasick(pats)
    assert ac.count_nonoverlapping(text) == ref_counts(text, pats)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab ", min_size=0, max_size=200),
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=5).filter(lambda s: s.strip() != "" or s != ""),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
def test_hypothesis_differential(text, patterns):
    ac = AhoCorasick(patterns)
    assert ac.count_nonoverlapping(text) == ref_counts(text, patterns)


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=300),
    st.lists(
        st.sampled_from(
            ["a", "ab", "ba", "aba", "bab", "the", "he", "she", "hers", "a b", " b "]
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
)
def test_hypothesis_classic_patterns(text, patterns):
    ac = AhoCorasick(patterns)
    assert ac.count_nonoverlapping(text) == ref_counts(text, patterns)

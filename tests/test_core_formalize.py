"""Golden tests for formalization + filters (core/formalize.py, core/filters.py)."""

import zlib

from logtemplatecrawler_spark.core.filters import prefilter_keep, template_valid
from logtemplatecrawler_spark.core.formalize import (
    TOKEN_TYPES,
    formalize_template,
    match_tokens,
    segment_template,
)


def _expected_choice(arg: str, slot_idx: int, candidates):
    return candidates[zlib.crc32(f"{arg}|{slot_idx}".encode()) % len(candidates)]


def test_segment_basic():
    assert segment_template("a {} b {} c") == ["a ", "{}", " b ", "{}", " c"]
    assert segment_template("{}") == ["{}"]
    assert segment_template("no slots here") == ["no slots here"]


def test_segment_named_braces_escaped():
    # '{key}' → '{{key}}' inside the literal run (formalizer.py:88-91).
    assert segment_template("set {key} to {}") == ["set {{key}} to ", "{}"]


def test_segment_unclosed_brace_stalls_bounded():
    # A lone '{' with no '}' stalls the cursor; the bounded loop exits
    # (formalizer.py:72-75) and the pending literal is flushed.
    assert segment_template("ab{cd") == ["ab"]


def test_formalize_count_mismatch_dropped():
    # 2 slots, 1 arg → dropped (mask compares original counts).
    assert formalize_template("a {} b {}", ["x"]) is None
    # 1 slot, 2 args → trim quirk removes ONE arg but the mask still uses the
    # original count → dropped (formalizer.py:19-21,33-37).
    assert formalize_template("a {}", ["x", "y"]) is None


def test_formalize_no_candidate_keeps_bare_slot():
    assert formalize_template("v {}", ["zqx"]) == "v {}"


def test_formalize_deterministic_choice():
    # 'count' hits IntegerPlaceholder only (keyword 'count').
    assert formalize_template("n = {}", ["count"]) == "n = {IntegerPlaceholder}"
    # 'fileName': Path (file) + User (name) + String (name) — pick is crc32-determined.
    cands = []
    for name, kws in TOKEN_TYPES:
        if any("filename".find(k) >= 0 for k in kws):
            cands.append(name)
    assert cands == ["PathPlaceholder", "UserPlaceholder", "StringPlaceholder"]
    expected = _expected_choice("fileName", 0, cands)
    assert formalize_template("f {}", ["fileName"]) == "f {" + expected + "}"


def test_formalize_no_args_passthrough():
    assert formalize_template("plain message", []) == "plain message"


def test_formalize_null_dropped():
    assert formalize_template(None, []) is None


def test_match_tokens_slot_indexed_by_arg_position():
    segs = ["a ", "{}", " b ", "{}"]
    out = match_tokens(segs, ["count", "zqx"])
    assert out == "a {IntegerPlaceholder} b {}"


def test_prefilter():
    assert not prefilter_keep("done")          # ≤5 chars
    assert not prefilter_keep("x.info(\"======\")")  # 6+ repeated chars
    assert prefilter_keep('log.info("hello")')


def test_template_validity_permissive_or():
    assert template_valid("this is long enough to pass")
    assert template_valid("ok")                 # contains letters → passes
    assert template_valid("{}")                 # fails letters but passes keyword term
    assert template_valid("static x")           # keyword-start but has letters
    # 13 bare slots would exceed the reference's *intended* 12-placeholder cap,
    # but that term is dead code (bitwise-NOT precedence) — still passes.
    assert template_valid("{}" * 13)

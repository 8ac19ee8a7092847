"""Golden tests for the call-site extractor (core/extract.py).

Expected raw strings are hand-derived from the reference algorithm
(/root/reference/src/templatecrawler/logextractor/java/log4j.py:58-137) —
they pin behavior independent of our implementation.
"""

from logtemplatecrawler_spark.core.extract import (
    extract_statements,
    statement_begin,
    statement_end,
    trigger_for,
    TRIGGERS,
)


def test_basic_slf4j_statement():
    src = 'class A {\n    void f() {\n        log.info("hello {}", x);\n    }\n}\n'
    assert extract_statements(src, "java", "slf4j") == ['log.info("hello {}", x)']


def test_statement_after_semicolon_boundary():
    src = "class A {\n  void f() {\n    int x = 1;\n    log.warn(\"w\", x);\n  }\n}\n"
    # Backwards scan hits the ';' of `int x = 1;`, then the whitespace-run
    # bookkeeping lands on the 'l' of log.
    assert extract_statements(src, "java", "slf4j") == ['log.warn("w", x)']


def test_semicolon_inside_string_truncates():
    # QUIRK: string literals are not skipped (no-op _read_string,
    # log4j.py:115-122) — the ';' inside the literal ends the statement.
    src = 'class A {\n  void f() {\n    log.info("a; b", x);\n  }\n}\n'
    assert extract_statements(src, "java", "slf4j") == ['log.info("a']


def test_no_trailing_semicolon_slices_to_eof():
    src = 'class A {\n  void f() {\n    log.error("boom", e)\n  }\n}\n'
    # _end_of_line returns None → slice to EOF (log4j.py:108-113).
    assert extract_statements(src, "java", "slf4j") == ['log.error("boom", e)\n  }\n}\n']


def test_comment_boundary_runs_forward():
    src = 'class A {\n  void f() {\n    // prepare\n    log.info("x{}", y);\n  }\n}\n'
    assert extract_statements(src, "java", "slf4j") == ['log.info("x{}", y)']


def test_annotation_boundary():
    src = 'class A {\n  @Deprecated\n  void f() {\n    x.debug("d", v);\n  }\n}\n'
    assert extract_statements(src, "java", "slf4j") == ['x.debug("d", v)']


def test_block_comment_end_boundary():
    src = 'class A {\n  void f() {\n    /* note */ log.info("n", v);\n  }\n}\n'
    # `*/` boundary returns index right after the whitespace run.
    assert extract_statements(src, "java", "slf4j") == ['log.info("n", v)']


def test_arrow_lambda_boundary():
    src = 'class A {\n  void f() {\n    r.forEach(x -> log.info("l", x));\n  }\n}\n'
    assert extract_statements(src, "java", "slf4j") == ['log.info("l", x))']


def test_mid_file_error_keeps_earlier_statements():
    # Second statement's begin-scan hits '{' whose line never ends (no
    # newline to EOF) → IndexError in _skip_past_line → rest of file aborted,
    # first statement kept (reference: try wraps the loop, log4j.py:28-41).
    src = 'class A {\n  void f() {\n    log.info("first", a);\n  }\n}\n' \
          'class B { void g() { log.info("second", b); } }'
    out = extract_statements(src, "java", "slf4j")
    assert out == ['log.info("first", a)']


def test_triggers_per_framework():
    assert trigger_for("java", "slf4j") is TRIGGERS["slf4j"]
    assert trigger_for("java", "unknown") is TRIGGERS["log4j"]
    assert trigger_for("java", "util") is TRIGGERS["utillogger"]
    assert trigger_for("c", "anything") is TRIGGERS["c"]
    assert trigger_for("python", "unknown") is None


def test_log4j_trigger_matches_bare_printf():
    # log4j trigger has no leading dot (log4j.py:13).
    src = 'void f() {\n    printf("%d", x);\n}\n'
    assert extract_statements(src, "java", "log4j") == ['printf("%d", x)']


def test_c_trigger_excludes_letter_prefixed_names():
    src = "int f(void) {\n    myprintf(\"no\");\n    printf(\"yes %d\", v);\n}\n"
    # 'myprintf' is letter-prefixed → the C trigger's leading group rejects it.
    assert extract_statements(src, "c", "unknown") == ['printf("yes %d", v)']


def test_begin_of_line_start_of_file_returns_zero():
    data = 'log.info("x")'
    # scan never examines index 0 and falls off → 0 (log4j.py:70,91-92).
    assert statement_begin(data, data.index("(") + 1) == 0


def test_statement_end_is_next_semicolon():
    assert statement_end("abc;def", 0) == 3
    assert statement_end("abcdef", 0) is None

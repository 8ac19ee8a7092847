"""Deterministic synthetic Common-Crawl-style pages + seeds + robots fixtures.

Schema per BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Everything derives from ``random.Random(seed)`` (default 42) — no wall clock,
no external data.  Page bodies are synthetic Java/C/Python source files whose
log statements cover every branch of the reference pipeline: all four trigger
regexes, concatenation chains, nested String.format, printf specifiers,
comment/annotation statement starts, ';' inside string literals, '{named}'
braces, too-short statements, repeated-char statements, and cross-page
duplicate statements (dedup exercise).  Hosts are Zipf-distributed so the
politeness/salting machinery has real skew to break.  Pages embed outlink
URLs (in comments) so frontier link-discovery has edges to follow.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Dict, List, Optional

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)

_WORDS = (
    "request session cache index shard batch worker queue task node cluster "
    "segment bucket token record stream buffer block handle socket channel "
    "page frame slot lease epoch round region router filter merge commit"
).split()

_VAR_POOLS = {
    # Variable names chosen to hit specific TokenType keyword lists
    # (core/formalize.py TOKEN_TYPES) plus no-candidate names.
    "int": ["count", "index", "retryCount", "numItems", "offset", "totalSum"],
    "float": ["ratio", "loadRatio", "frequency", "interval"],
    "path": ["filePath", "dirName", "location", "fileName"],
    "url": ["hostAddr", "targetUrl", "remoteUri", "address"],
    "time": ["timestamp", "elapsedSeconds", "startTime"],
    "id": ["requestId", "sessionId", "identifier"],
    "user": ["userName", "email", "userMail"],
    "bool": ["boolFlag", "isBooleanSet"],
    "status": ["state", "statusCode", "condition"],
    "plain": ["ret", "err", "x", "tmp", "val", "obj"],
}
_ALL_VARS = [v for pool in _VAR_POOLS.values() for v in pool]

_PRIORITY_DIRS = ["src", "core", "app", "libs", "source"]
_EXCLUDE_DIRS = ["tests", "docs", "examples", "scripts"]

_JAVA_IMPORTS = {
    "slf4j": "import org.slf4j.Logger;\nimport org.slf4j.LoggerFactory;\n",
    "log4j": "import org.apache.log4j.Logger;\n",
    "utillogger": "import java.util.logging.Logger;\n",
    "unknown": "",
}


def _phrase(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _java_statement(rng: random.Random, framework: str) -> str:
    """One java log statement line; shapes weighted to exercise all branches."""
    if framework == "utillogger":
        method = rng.choice(["fine", "warning", "severe", "info"])
        shape = rng.choice(["plain", "plain", "concat"])
    else:
        method = rng.choice(["info", "warn", "error", "debug", "trace"])
        shape = rng.choice(
            ["slots", "slots", "slots", "concat", "concat", "nested", "plain",
             "braced", "semicolon", "short", "repeat"]
        )
    msg = _phrase(rng, rng.randint(2, 5))
    if shape == "slots":
        nvars = rng.randint(1, 3)
        vars_ = [rng.choice(_ALL_VARS) for _ in range(nvars)]
        fmt = msg + "".join(f" {{}} {_phrase(rng, 1)}" for _ in range(nvars))
        return f'        log.{method}("{fmt}", {", ".join(vars_)});'
    if shape == "concat":
        var = rng.choice(_ALL_VARS)
        return f'        log.{method}("{msg}: " + {var});'
    if shape == "nested":
        var = rng.choice(_ALL_VARS)
        return f'        log.{method}(String.format("{msg} %d end", {var}));'
    if shape == "braced":
        var = rng.choice(_ALL_VARS)
        return f'        log.{method}("{msg} {{key}} value {{}}", {var});'
    if shape == "semicolon":
        # ';' inside the string literal — the extractor truncates there (QUIRK).
        return f'        log.{method}("{msg}; trailing part");'
    if shape == "short":
        return f'        log.{method}("ok");'
    if shape == "repeat":
        return f'        log.{method}("======== {msg}");'
    return f'        log.{method}("{msg} finished cleanly");'


def _c_statement(rng: random.Random) -> str:
    func = rng.choice(["printf", "fprintf", "printk", "warning", "pr_warn", "dprintk"])
    msg = _phrase(rng, rng.randint(2, 4))
    spec = rng.choice(["%d", "%s", "%lu", "%x", "%f"])
    var = rng.choice(_ALL_VARS)
    if func == "fprintf":
        return f'    fprintf(stderr, "{msg} {spec}\\n", {var});'
    if func == "printk":
        return f'    printk("{msg} {spec}\\n", {var});'
    return f'    {func}("{msg} {spec}", {var});'


def _java_file(rng: random.Random, framework: str, class_name: str,
               outlinks: List[str], methods=(1, 3), stmts=(1, 4)) -> str:
    lines = [_JAVA_IMPORTS[framework]]
    lines.append(f"public class {class_name} {{")
    lines.append("    private static final Logger log = LoggerFactory.getLogger();")
    for link in outlinks:
        lines.append(f"    // see {link}")
    n_methods = rng.randint(*methods)
    for m in range(n_methods):
        lines.append(f"    public void run{m}(int count, String userName) {{")
        if rng.random() < 0.3:
            lines.append("        // preparing the work queue")
        if rng.random() < 0.2:
            lines.append("        @SuppressWarnings")
        for _ in range(rng.randint(*stmts)):
            lines.append(_java_statement(rng, framework))
        lines.append("    }")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


def _c_file(rng: random.Random, outlinks: List[str],
            methods=(1, 3), stmts=(1, 4)) -> str:
    lines = ["#include <stdio.h>", "#include <linux/kernel.h>", ""]
    for link in outlinks:
        lines.append(f"/* see {link} */")
    # Make the java-engine detector fire for C files (the reference routes C
    # to the java detector): 'warning'/'info'/'log' substrings anywhere hit
    # the unanchored utillogger statement rule.
    lines.append("/* logging helpers - warning paths included */")
    n_funcs = rng.randint(*methods)
    for f in range(n_funcs):
        lines.append(f"static int handler{f}(void) {{")
        lines.append("    int ret = 0;")
        for _ in range(rng.randint(*stmts)):
            lines.append(_c_statement(rng))
        lines.append("    return ret;")
        lines.append("}")
    lines.append("")
    return "\n".join(lines)


def _python_file(rng: random.Random) -> str:
    return (
        "import logging\n\nlog = logging.getLogger(__name__)\n\n"
        f"def handle():\n    log.info('{_phrase(rng, 3)}')\n"
    )


_ZIPF_CDF_CACHE: Dict[int, List[float]] = {}


def _zipf_host(rng: random.Random, n_hosts: int) -> str:
    """Zipf(1.2)-ish host pick: heavy head, long tail — real crawl skew.
    Inverse-CDF over precomputed cumulative weights (bisect)."""
    import bisect
    cdf = _ZIPF_CDF_CACHE.get(n_hosts)
    if cdf is None:
        weights = [1.0 / (i ** 1.2) for i in range(1, n_hosts + 1)]
        total = sum(weights)
        acc = 0.0
        cdf = []
        for w in weights:
            acc += w / total
            cdf.append(acc)
        _ZIPF_CDF_CACHE[n_hosts] = cdf
    i = bisect.bisect_left(cdf, rng.random()) + 1
    return f"host{min(i, n_hosts):03d}.example.org"


def generate_pages(n_pages: int = 400, seed: int = 42,
                   n_hosts: Optional[int] = None,
                   methods=(1, 3), stmts=(1, 4)) -> List[Dict]:
    """Deterministic pages rows: url, warc_ts, html, text, lang.

    ``methods``/``stmts`` control page density (functions per file ×
    statements per function).  Defaults give small test pages; benchmark
    corpora use denser pages matching realistic source-file sizes.
    """
    rng = random.Random(seed)
    n_hosts = n_hosts or max(8, n_pages // 20)
    rows: List[Dict] = []
    urls: List[str] = []
    # Pre-assign urls so outlinks can reference real pages.
    langs = []
    for i in range(n_pages):
        host = _zipf_host(rng, n_hosts)
        lang = rng.choices(["java", "c", "python", "csharp"],
                           weights=[60, 25, 10, 5])[0]
        top = rng.choice(_PRIORITY_DIRS + _EXCLUDE_DIRS)
        ext = {"java": "java", "c": "c", "python": "py", "csharp": "cs"}[lang]
        name = f"File{i:05d}"
        url = f"https://{host}/{top}/{name}.{ext}"
        urls.append(url)
        langs.append(lang)
    for i in range(n_pages):
        rng_page = random.Random((seed << 16) ^ i)  # per-page stream → order-free
        lang = langs[i]
        n_links = rng_page.randint(0, 3)
        outlinks = [urls[rng_page.randrange(n_pages)] for _ in range(n_links)]
        if lang == "java":
            framework = rng_page.choice(["slf4j", "slf4j", "log4j", "utillogger", "unknown"])
            text = _java_file(rng_page, framework, f"File{i:05d}", outlinks,
                              methods=methods, stmts=stmts)
        elif lang == "c":
            text = _c_file(rng_page, outlinks, methods=methods, stmts=stmts)
        elif lang == "python":
            text = _python_file(rng_page)
        else:
            text = f"// csharp stub file {i}\nclass C{i} {{ }}\n"
        # A few non-utf8-decodable html payloads exercise the decode fallback
        # (reference crawler.py:105-116); text stays the decoded truth.
        if i % 97 == 13:
            html = text.encode("latin1", errors="replace")
        else:
            html = text.encode("utf-8")
        rows.append({
            "url": urls[i],
            "warc_ts": _EPOCH + timedelta(seconds=i * 37),
            "html": html,
            "text": text,
            "lang": lang,
        })
    return rows


def generate_seeds(pages: List[Dict], seed: int = 42, fraction: float = 0.3) -> List[Dict]:
    """Seed rows (url, priority): a deterministic subset of page urls.

    Priority models the reference's stars/size admission heuristics
    (operators.py:112-116, dags/log2vec_process-repository.py:115-116).
    """
    rng = random.Random(seed + 1)
    rows = []
    for p in pages:
        if rng.random() < fraction:
            rows.append({"url": p["url"], "priority": rng.randint(0, 1000)})
    return rows


def generate_robots(pages: List[Dict], seed: int = 42) -> List[Dict]:
    """robots rows (host, disallow_prefix): a few hosts/path-prefixes blocked."""
    rng = random.Random(seed + 2)
    hosts = sorted({p["url"].split("/")[2] for p in pages})
    rows = []
    for h in hosts:
        r = rng.random()
        if r < 0.08:
            rows.append({"host": h, "disallow_prefix": "/"})      # fully blocked
        elif r < 0.25:
            rows.append({"host": h, "disallow_prefix": "/tests"})
            rows.append({"host": h, "disallow_prefix": "/docs"})
    return rows


# ---------------------------------------------------------------------------
# Spark/parquet adapters
# ---------------------------------------------------------------------------

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, lang string")
SEEDS_DDL = "url string, priority int"
ROBOTS_DDL = "host string, disallow_prefix string"


def pages_df(spark, n_pages: int = 400, seed: int = 42):
    return spark.createDataFrame(generate_pages(n_pages, seed), schema=PAGES_DDL)


def seeds_df(spark, pages: List[Dict], seed: int = 42, fraction: float = 0.3):
    return spark.createDataFrame(generate_seeds(pages, seed, fraction), schema=SEEDS_DDL)


def robots_df(spark, pages: List[Dict], seed: int = 42):
    rows = generate_robots(pages, seed)
    return spark.createDataFrame(rows, schema=ROBOTS_DDL) if rows else \
        spark.createDataFrame([], schema=ROBOTS_DDL)


def write_pages_parquet(path: str, n_pages: int = 400, seed: int = 42,
                        n_files: int = 16, methods=(1, 3), stmts=(1, 4)) -> None:
    """Write fixture pages as a parquet DIRECTORY of ``n_files`` part files
    with pyarrow (no Spark session needed).

    Multiple files matter: a single-file single-row-group corpus gives the
    scan exactly one input split, capping parallelism regardless of cores.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_pages(n_pages, seed, methods=methods, stmts=stmts)
    os.makedirs(path, exist_ok=True)
    n_files = max(1, min(n_files, len(rows) or 1))
    chunk = (len(rows) + n_files - 1) // n_files
    for fi in range(n_files):
        part = rows[fi * chunk:(fi + 1) * chunk]
        if not part:
            break
        table = pa.table({
            "url": [r["url"] for r in part],
            "warc_ts": pa.array([r["warc_ts"] for r in part], type=pa.timestamp("us")),
            "html": pa.array([r["html"] for r in part], type=pa.binary()),
            "text": [r["text"] for r in part],
            "lang": [r["lang"] for r in part],
        })
        pq.write_table(table, os.path.join(path, f"part-{fi:05d}.parquet"))

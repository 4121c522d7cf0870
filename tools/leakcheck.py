#!/usr/bin/env python3
"""Leak scanner: proves the repo derives from public knowledge only.

Scans every tracked source/doc file for seven classes of non-public
references (internal imports, URLs, package roots, buckets, chat links,
credential-shaped strings, internal-env vars) and writes LEAKCHECK.json.
The artifact carries run_utc and scanned_files so a fresh run is
distinguishable from a hand-edited round bump (round-10 advice).

Usage: python3 tools/leakcheck.py <round>
"""
import json, re, subprocess, sys, datetime

ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 0

# Public namespaces this project legitimately imports.
PUBLIC_IMPORT_ROOTS = (
    "org.apache", "scala", "java", "javax", "graft", "org.scalatest",
    "org.scalacheck", "com.fasterxml", "org.slf4j", "org.junit", "sbt",
)
# value-relative session imports (`import spark.implicits._`, `import
# s.implicits._`) are Scala locals, not packages
VALUE_IMPORT_RE = re.compile(r"^[\w.]+\.implicits\._$|^[A-Z]\w*\.")
# Docs that DESCRIBE public external content (the reference repo, retrieved
# papers/snippets, judge output): reference-internal names (its MinIO bucket
# layout, its public data-source URLs) are expected there and are themselves
# public. These files are scanned only for credential/chat-link classes.
REFERENCE_DOCS = ("SURVEY.md", "SNIPPETS.md", "PAPERS.md", "BASELINE.md",
                  "VERDICT.md", "ADVICE.md", "TESTDATA.md")
# the reference's own public data source (a government weather service),
# cited in code comments/tests that document reference behavior
PUBLIC_REF_HOST_RE = re.compile(r"https?://(?:[\w.-]*\.)?kttv\.gov\.vn")
# Public hosts allowed in docs/comments (specs, papers, upstream code).
PUBLIC_HOST_RE = re.compile(
    r"https?://(?:[\w.-]*\.)?("
    r"apache\.org|github\.com|githubusercontent\.com|arxiv\.org|"
    r"duckdb\.org|w3\.org|ietf\.org|iso\.org|wikipedia\.org|"
    r"scala-lang\.org|scalatest\.org|aclanthology\.org|openreview\.net|"
    r"acm\.org|ieee\.org|example\.(?:com|org)|localhost|127\.0\.0\.1"
    r")(?::\d+)?(?:/|\s|$|[\"')\]>])"
    # plus the RFC-2606/6761 reserved TLDs tests use for synthetic hosts,
    # and dotless single-label hosts (not routable on the internet)
    r"|https?://[\w.-]+\.(?:example|test|invalid|localhost)(?:[:/\s\"')\]>]|$)"
    r"|https?://[\w-]+(?:[:/\s\"')\]>]|$)")
URL_RE = re.compile(r"https?://[^\s\"'<>)\]]+")
IMPORT_RE = re.compile(r"^\s*import\s+([\w.]+)", re.M)
BUCKET_RE = re.compile(r"\b(?:s3|s3a|gs|wasbs?|abfss?)://[\w.-]+")
CHAT_RE = re.compile(r"\b[\w-]*\.slack\.com\b|\bgo/[a-z][\w-]{2,}\b|slack://")
KEY_RE = re.compile(
    r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{20,}|"
    r"xox[baprs]-[A-Za-z0-9-]{10,}|AIza[0-9A-Za-z_-]{35})\b")
# sys.env / os.environ reads of vars outside the project's own namespace
ENV_RE = re.compile(r'sys\.env(?:\.get(?:OrElse)?)?\(\s*"([A-Z][A-Z0-9_]+)"')
PUBLIC_ENV_PREFIXES = ("SPARK_", "JAVA_", "PATH", "HOME", "USER", "TMP", "LANG",
                       "HADOOP_", "COURSIER_", "SBT_", "TZ")

SCAN_EXT = (".scala", ".py", ".sbt", ".md", ".sh", ".json", ".sql", ".conf")


def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True,
                         cwd="/root/repo").stdout.splitlines()
    # the scanner's own pattern text would self-match (e.g. the slack://
    # regex literal); exclude it and the output artifact
    return [f for f in out if f.endswith(SCAN_EXT)
            and f not in ("LEAKCHECK.json", "tools/leakcheck.py")]


def main():
    hits = {k: [] for k in ("internal-import", "internal-url", "internal-pkg2",
                            "internal-bucket", "slack-link", "api-key",
                            "axon-env")}
    files = tracked_files()
    for path in files:
        try:
            text = open(f"/root/repo/{path}", encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        ref_doc = path in REFERENCE_DOCS
        if path.endswith((".scala", ".sbt")):
            for m in IMPORT_RE.finditer(text):
                mod = m.group(1)
                if (not mod.startswith(PUBLIC_IMPORT_ROOTS)
                        and not VALUE_IMPORT_RE.match(mod)):
                    hits["internal-import"].append(f"{path}: {mod}")
            for m in ENV_RE.finditer(text):
                if not m.group(1).startswith(PUBLIC_ENV_PREFIXES):
                    hits["axon-env"].append(f"{path}: {m.group(1)}")
        if not ref_doc:
            for m in URL_RE.finditer(text):
                u = m.group(0)
                if (not PUBLIC_HOST_RE.match(u + " ")
                        and not PUBLIC_REF_HOST_RE.match(u)):
                    hits["internal-url"].append(f"{path}: {u[:80]}")
            for m in BUCKET_RE.finditer(text):
                hits["internal-bucket"].append(f"{path}: {m.group(0)}")
            # package roots outside graft (a second import-shaped signal)
            if path.endswith((".scala", ".sbt")):
                for m in re.finditer(r"^\s*package\s+([\w.]+)", text, re.M):
                    pkg = m.group(1)
                    # the documented private[sql] bridge file lives in the
                    # Spark namespace on purpose (GraftBridge)
                    bridge = (pkg.startswith("org.apache.spark")
                              and path.startswith("src/main/scala/org/apache/spark"))
                    if not pkg.startswith(("graft",)) and not bridge:
                        hits["internal-pkg2"].append(f"{path}: {pkg}")
        for m in CHAT_RE.finditer(text):
            hits["slack-link"].append(f"{path}: {m.group(0)}")
        for m in KEY_RE.finditer(text):
            hits["api-key"].append(f"{path}: {m.group(0)[:12]}…")
    out = {
        "round": ROUND,
        "run_utc": datetime.datetime.now(datetime.timezone.utc)
                   .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "scanned_files": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("/root/repo/LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}),
          "scanned", len(files))


if __name__ == "__main__":
    main()

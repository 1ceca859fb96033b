#!/usr/bin/env python3
"""Hygiene scan over src/main: the library must reference only public
surface — public package roots, public doc URLs, its own env-var
namespace, no credential-shaped strings, no chat/storage service links.

Emits LEAKCHECK.json with provenance (commit hash, UTC timestamp, file
count) so a fresh scan is distinguishable from a hand-edited artifact
(VERDICT r9 what's-wrong #5).

Usage: python3 tools/leakcheck.py [--round N]
"""
import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src" / "main"

# public package roots this project may import; "spark."/"s." are
# session-val implicits imports and a leading capital is a sibling
# object in the same package — both local, not external namespaces
IMPORT_OK = ("scala.", "java.", "javax.", "org.apache.", "graft.",
             "spark.", "s.")
# public hosts documentation links may point at (plus bare placeholder
# hosts used in synthetic test data, e.g. http://ref, https://site)
URL_OK = re.compile(
    r"https?://(localhost|127\.0\.0\.1|[a-z]+([.'\"\\]|$)|"
    r"([\w-]+\.)*(apache\.org|github\.com|arxiv\.org|acm\.org|ieee\.org|"
    r"wikipedia\.org|duckdb\.org|qdrant\.tech|influxdata\.com))")
ENV_OK = re.compile(r"^(SPARK_|GRAFT_|COURSIER_|JAVA_|PATH$|HOME$|USER$)")

CHECKS = {
    "internal-import": lambda line: (
        (m := re.match(r"\s*import\s+([\w.]+)", line)) is not None
        and not m.group(1).startswith(IMPORT_OK)
        and not m.group(1)[0].isupper()),
    "internal-url": lambda line: any(
        not URL_OK.match(u) for u in re.findall(r"https?://\S+", line)),
    "internal-pkg2": lambda line: (
        (m := re.match(r"\s*package\s+([\w.]+)", line)) is not None
        and not m.group(1).startswith("graft")),
    "internal-bucket": lambda line: re.search(
        r"\b(s3a?|gs|abfss?)://", line) is not None,
    "slack-link": lambda line: re.search(
        r"slack\.com|slack://|app\.slack", line, re.I) is not None,
    "api-key": lambda line: re.search(
        r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|"
        r"(api[_-]?key|secret|token)\s*[:=]\s*['\"][A-Za-z0-9+/]{16,})", line,
        re.I) is not None,
    "axon-env": lambda line: any(
        not ENV_OK.match(v)
        for v in re.findall(r'sys\.env(?:\.getOrElse)?\(\s*"([A-Z_]+)"', line)),
}


def main() -> int:
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    hits = {cat: [] for cat in CHECKS}
    files = sorted(SRC.rglob("*.scala"))
    for path in files:
        rel = path.relative_to(ROOT)
        for lineno, line in enumerate(
                path.read_text(encoding="utf-8").splitlines(), 1):
            for cat, check in CHECKS.items():
                if check(line):
                    hits[cat].append(f"{rel}:{lineno}: {line.strip()[:120]}")
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip() or "unknown"
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "provenance": {
            "tool": "tools/leakcheck.py",
            "commit": commit,
            "generated_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "files_scanned": len(files),
        },
    }
    (ROOT / "LEAKCHECK.json").write_text(
        json.dumps(out, indent=2) + "\n", encoding="utf-8")
    print(f"LEAKCHECK: {out['n_hits']} hits over {len(files)} files "
          f"at {commit[:12]}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

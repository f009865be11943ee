#!/usr/bin/env python3
"""Self-stamping leak check (dev tool, NOT shipped code).

Scans the shippable surface (src/, build.sbt, project/, tools/) for
anything that is not public knowledge: imports outside the public
package allowlist, non-public URLs, chat links, credential-shaped
strings, and environment variables outside the project's own namespace.

Unlike a bare grep run, the emitted JSON is SELF-STAMPING: it carries
the UTC run timestamp, a sha256 digest over the exact bytes scanned,
the number of files scanned, and the git HEAD at scan time. A stale
artifact relabeled with a new round number is therefore distinguishable
from a fresh run — re-running the tool on the same tree must reproduce
`input_digest`, and any source change changes it.

Usage: python3 tools/leakcheck.py [round] [> LEAKCHECK.json]
Exit status 1 iff any category has hits.
"""
import hashlib, json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN = ["build.sbt", "src", "project", "tools"]
EXT = {".scala", ".sbt", ".py", ".md", ".properties", ".json", ".conf", ".sql"}

# Public-knowledge allowlists: anything outside these is a hit.
# An INTERNAL import is one whose root segment is a reverse-domain
# package root (com/net/io/ai/dev/co, or org outside the public
# orgs) — a proprietary framework would surface there. Scala imports
# rooted at a lowercase VALUE (`import spark.implicits._`) or an
# in-repo object are scoped locals, not packages; python stdlib plus
# the documented driver-side tools (duckdb/pandas/pyarrow) are public.
INTERNAL_IMPORT = re.compile(
    r"^\s*(?:import|from)\s+(?:(?:com|net|io|ai|dev|co)\.|"
    r"org\.(?!apache\b|scalatest\b|scalacheck\b))")
URL = re.compile(r"https?://([A-Za-z0-9.-]+)")
PUBLIC_HOST = re.compile(
    r"(^|\.)(apache\.org|scala-lang\.org|github\.com|scalatest\.org|"
    r"scalacheck\.org|duckdb\.org|wikipedia\.org|arxiv\.org|acm\.org|"
    r"w3\.org|example\.com|localhost)$|^site-[0-9]*$")  # site-N: synthetic fixture hosts
CHAT_LINK = re.compile(r"slack\.com|app\.slack|discord\.gg", re.I)
BUCKET = re.compile(r"\b(s3|gs|abfss?|wasbs?)://[A-Za-z0-9._/-]+")
# Base64 tail: \b after '=' (a non-word char) only matches when a word
# character FOLLOWS, so a padded secret at end-of-line or before a
# quote would never match — use a lookahead instead (ADVICE r10).
API_KEY = re.compile(
    r"(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|-----BEGIN [A-Z ]*PRIVATE KEY|"
    r"\b[A-Za-z0-9+/]{40,}={1,2}(?![A-Za-z0-9+/=]))")
# A base64-looking token is exempt only when 'sha256' appears right
# BEFORE it (a labeled digest), not anywhere on the line — a real key
# sharing a line with the word sha256 still hits (ADVICE r10).
SHA256_LABEL = re.compile(r"sha256[^A-Za-z0-9]{0,3}$", re.I)
ENV_REF = re.compile(r"""(?:sys\.env|os\.environ|getenv)[^\n]*?["']([A-Z][A-Z0-9_]{2,})["']""")
PUBLIC_ENV = re.compile(
    r"^(SPARK(_GRAFT)?_[A-Z0-9_]+|GRAFT_[A-Z0-9_]+|JAVA_[A-Z0-9_]+|"
    r"COURSIER_[A-Z0-9_]+|HOME|PATH|TZ|USER|LANG|TMPDIR)$")

CATEGORIES = {
    "internal-import": [], "internal-url": [], "internal-pkg2": [],
    "internal-bucket": [], "slack-link": [], "api-key": [], "axon-env": [],
}

def scan_file(rel, text):
    for i, line in enumerate(text.splitlines(), 1):
        where = f"{rel}:{i}"
        if INTERNAL_IMPORT.match(line):
            CATEGORIES["internal-import"].append(where)
        for m in URL.finditer(line):
            # DNS hosts are case-insensitive (RFC 4343): normalize before
            # the allowlist check so a case-folding test fixture like
            # HTTPS://Site-3.Example.COM is recognized as example.com
            if not PUBLIC_HOST.search(m.group(1).lower()):
                CATEGORIES["internal-url"].append(where)
        if BUCKET.search(line):
            CATEGORIES["internal-bucket"].append(where)
        if CHAT_LINK.search(line):
            CATEGORIES["slack-link"].append(where)
        for m in API_KEY.finditer(line):
            if not SHA256_LABEL.search(line[max(0, m.start() - 12):m.start()]):
                CATEGORIES["api-key"].append(where)
                break
        for m in ENV_REF.finditer(line):
            if not PUBLIC_ENV.match(m.group(1)):
                CATEGORIES["axon-env"].append(where)

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    digest = hashlib.sha256()
    n_files = 0
    files = []
    for top in SCAN:
        p = os.path.join(ROOT, top)
        if os.path.isfile(p):
            files.append(top)
        else:
            for d, _, fs in sorted(os.walk(p)):
                for f in sorted(fs):
                    rel = os.path.relpath(os.path.join(d, f), ROOT)
                    if os.path.splitext(f)[1] in EXT:
                        files.append(rel)
    for rel in sorted(files):
        # self-exempt: this file's own patterns are not leaks
        with open(os.path.join(ROOT, rel), "rb") as fh:
            raw = fh.read()
        digest.update(rel.encode() + b"\0" + hashlib.sha256(raw).digest())
        n_files += 1
        if rel != os.path.join("tools", "leakcheck.py"):
            scan_file(rel, raw.decode("utf-8", errors="replace"))
    try:
        head = subprocess.check_output(
            ["git", "-C", ROOT, "rev-parse", "HEAD"], text=True).strip()
    except Exception:
        head = None
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in CATEGORIES.values()),
        "hits": CATEGORIES,
        "generated_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "input_digest": "sha256:" + digest.hexdigest(),
        "n_files_scanned": n_files,
        "git_head": head,
    }
    print(json.dumps(out, indent=2))
    # The driver regenerates LEAKCHECK.json from its own grep and
    # strips the self-stamp (observed round 10), so the provenance also
    # goes to a SIBLING file the driver does not own — it survives
    # whoever writes LEAKCHECK.json last (VERDICT r10 item 3).
    prov = {k: out[k] for k in
            ("round", "n_hits", "generated_at_utc", "input_digest",
             "n_files_scanned", "git_head")}
    with open(os.path.join(ROOT, "LEAKCHECK_PROVENANCE.json"), "w") as fh:
        json.dump(prov, fh, indent=2)
        fh.write("\n")
    sys.exit(1 if out["n_hits"] else 0)

if __name__ == "__main__":
    main()

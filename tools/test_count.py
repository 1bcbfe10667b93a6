#!/usr/bin/env python3
"""Code-emitted ScalaTest ledger — the Verify.ledgerLine discipline
extended to the spec count (the r11 verdict's 514-vs-513 prose drift:
counts in COVERAGE.md must come from an artifact, never from a human).

Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
       python3 tools/test_count.py /tmp/sbt_test.log

Parses sbt's final summary line ("Tests: succeeded N, failed M, ...")
plus the per-suite completion lines, and prints one ledger line to paste
verbatim into COVERAGE.md. Exits 1 if any test failed or no summary was
found (a truncated log must not masquerade as a green run).
"""
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbt_test.log"
text = open(path, errors="replace").read()

# sbt aggregates all suites into one final line
m = None
for m in re.finditer(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", text):
    pass
if m is None:
    print("TESTLEDGER error: no sbt test summary found in", path)
    sys.exit(1)
ok, failed, canceled, ignored, pending = map(int, m.groups())
suites = len(set(re.findall(r"^\[info\] (\w+Spec):", text, re.M)))
passed_all = "All tests passed." in text
print(f"[testledger] specs={ok} failed={failed} canceled={canceled} "
      f"ignored={ignored} suites={suites} all_passed={passed_all}")
sys.exit(0 if failed == 0 and passed_all else 1)

#!/usr/bin/env python3
"""Doc-vs-source consistency check (round-9 answer to three rounds of stale README).

Counts the declared queries straight from the QDef registrations in src/main and
the oracle-gated subset (QDefs with Some(sql)), then asserts README.md states
exactly those numbers in its summary paragraph and its package-table row.

Usage: python3 tools/doc_check.py   (exit 0 = README matches source)
"""
import os, re, sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(HERE, "src/main/scala/graft")

declared, gated = set(), set()
for root, _, files in os.walk(QDIR):
    for fn in files:
        if not fn.endswith(".scala"):
            continue
        src = open(os.path.join(root, fn)).read()
        for m in re.finditer(r'QDef\(\s*"(q\d+_\w+)"\s*,\s*[\w.]+\s*,\s*(Some\(|None)', src):
            declared.add(m.group(1))
            if m.group(2) == "Some(":
                gated.add(m.group(1))

nums = sorted(int(re.match(r"q(\d+)_", q).group(1)) for q in declared)
problems = []
if not nums:
    problems.append("found no QDef registrations under src/main/scala/graft")
else:
    lo, hi = nums[0], nums[-1]
    missing = sorted(set(range(lo, hi + 1)) - set(nums))
    if missing:
        problems.append(f"query numbering has gaps: {missing}")

readme = open(os.path.join(HERE, "README.md")).read()
m = re.search(r"(\d+) queries are declared; (\d+) of them are DuckDB-hash-matched", readme)
if not m:
    problems.append("README summary sentence 'N queries are declared; M ... hash-matched' not found")
else:
    if int(m.group(1)) != len(declared):
        problems.append(f"README says {m.group(1)} declared, source has {len(declared)}")
    if int(m.group(2)) != len(gated):
        problems.append(f"README says {m.group(2)} oracle-gated, source has {len(gated)}")
m = re.search(r"q01–q(\d+) \(one `QDef` per operator\)", readme)
if not m:
    problems.append("README package-table row 'q01-qNNN' not found")
elif nums and int(m.group(1)) != nums[-1]:
    problems.append(f"README package table says q01-q{m.group(1)}, source tops out at q{nums[-1]}")

# Any README claim about a driver correctness artifact must match the artifact
# itself ("CORRECTNESS_rNN.json) scored X/Y oracle-gated green"): the round-10
# extension of the stale-counts guard — hand-edited driver numbers drift just
# like hand-edited totals did.
import json
for m in re.finditer(r"CORRECTNESS_r(\d+)\.json\) scored (\d+)/(\d+) oracle-gated", readme):
    rnd, claimed_pass, claimed_total = int(m.group(1)), int(m.group(2)), int(m.group(3))
    path = os.path.join(HERE, f"CORRECTNESS_r{rnd:02d}.json")
    if not os.path.exists(path):
        problems.append(f"README cites CORRECTNESS_r{rnd:02d}.json but it does not exist")
        continue
    art = json.load(open(path))
    # artifact schema: {qname: {rows_match, schema_match, hash_match, err}};
    # err == "no_oracle" marks a declared rows-only exemption (not gated)
    gated_rows = [v for v in art.values()
                  if isinstance(v, dict) and v.get("err") != "no_oracle"]
    passed = sum(1 for v in gated_rows
                 if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    if (passed, len(gated_rows)) != (claimed_pass, claimed_total):
        problems.append(
            f"README claims CORRECTNESS_r{rnd:02d} scored {claimed_pass}/{claimed_total}, "
            f"artifact says {passed}/{len(gated_rows)}")

# Stub-seam claims must not outlive the implementation (round-12 answer to the
# stale "only VIDEO demux remains a marked stub seam" row that survived a full
# round after the real MJPEG-in-AVI codec shipped): for each media kind, if the
# Codecs surface defines its codec entry point, no doc may still call that kind
# a stub/seam. Checked per SENTENCE so legitimate prose about the narrower
# labeled seams (e.g. "no ffmpeg-class INTER-frame codec") stays expressible —
# those sentences must simply not use the word "stub".
codecs_src = ""
mm_path = os.path.join(QDIR, "multimodal/Multimodal.scala")
if os.path.exists(mm_path):
    codecs_src = open(mm_path).read()
CODEC_ENTRY = {"video": "encodeAviMjpeg", "audio": "encodeWavPcm16", "image": "encodePng"}
for doc_name in ("SURVEY.md", "README.md"):
    doc = open(os.path.join(HERE, doc_name)).read()
    for sentence in re.split(r"(?<=[.;|])\s+", doc):
        low = sentence.lower()
        if "stub" not in low:
            continue
        for kind, entry in CODEC_ENTRY.items():
            if kind in low and entry in codecs_src:
                problems.append(
                    f"{doc_name} calls the {kind} path a stub, but Codecs.{entry} "
                    f"exists — true up the claim: {sentence[:120]!r}")

if problems:
    print("DOC CHECK FAIL:")
    for p in problems:
        print("  -", p)
    sys.exit(1)
print(f"DOC CHECK PASS: {len(declared)} declared (q{nums[0]:02d}-q{nums[-1]}), "
      f"{len(gated)} oracle-gated, README matches")

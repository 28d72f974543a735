#!/usr/bin/env python3
"""Artifact/code drift gate for the manual scale benches.

The r9 slip: BENCH_scale_docs.json was committed from an INTERMEDIATE
build — it lacked extras keys the final BenchScaleDocs writes
unconditionally, so a SURVEY claim (planted fuzzy-decon recall at 1M
docs) had no committed evidence. This check makes that class of drift
fail the gate the way a failed oracle does: every `extras("...")` key
and every `timed*("...")` query name in the scale-harness SOURCE must
be present in the committed artifact. (The artifact may carry MORE
keys than the source — e.g. best-of-N rep bookkeeping — but never
fewer.)
"""
import json
import re
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECKS = [
    ("src/main/scala/graft/BenchScale.scala", "BENCH_scale.json"),
    ("src/main/scala/graft/BenchScaleDocs.scala", "BENCH_scale_docs.json"),
]

rc = 0
for src_rel, art_rel in CHECKS:
    src_path = os.path.join(REPO, src_rel)
    art_path = os.path.join(REPO, art_rel)
    with open(src_path) as f:
        src = f.read()
    # strip line comments so documented examples can't create phantom keys
    src = re.sub(r"//[^\n]*", "", src)
    want_extras = set(re.findall(r'extras\("([A-Za-z0-9_]+)"\)', src))
    want_queries = set(re.findall(r'timed(?:Once|Write|Unit)?\("([A-Za-z0-9_]+)"', src))
    # r16: BenchScale's bucket sweep passes its seed/tick keys through
    # soakAt(n, seedKey, tickKey) — those literals are gate-required too
    for pair in re.findall(r'soakAt\(\s*\d+,\s*"([A-Za-z0-9_]+)",\s*"([A-Za-z0-9_]+)"', src):
        want_queries.update(pair)
    if not os.path.exists(art_path):
        print(f"[scale-artifact] FAIL {art_rel}: missing (source {src_rel} "
              f"defines {len(want_extras)} extras / {len(want_queries)} queries)")
        rc = 1
        continue
    with open(art_path) as f:
        art = json.loads(f.read())
    have_extras = set(art.get("extras", {}).keys()) | set(art.keys())
    have_queries = set(art.get("queries", {}).keys())
    missing_extras = sorted(want_extras - have_extras)
    missing_queries = sorted(want_queries - have_queries)
    if missing_extras or missing_queries:
        print(f"[scale-artifact] FAIL {art_rel}: committed artifact predates "
              f"the harness source — re-run {os.path.basename(src_rel)} and commit")
        if missing_extras:
            print(f"  missing extras keys: {', '.join(missing_extras)}")
        if missing_queries:
            print(f"  missing query keys: {', '.join(missing_queries)}")
        rc = 1
    else:
        print(f"[scale-artifact] ok {art_rel}: {len(want_queries)} queries, "
              f"{len(want_extras)} extras keys all present")

    # r17 (ADVICE r16, medium): the committed artifact must reflect the
    # DERIVED vec-sidecar layout — r16 shipped deriveBuckets in
    # seedVecSidecar but committed an artifact still carrying the old
    # fixed 256-bucket receipts. Cross-check the bucket-proportional
    # receipt against BucketStore.deriveBuckets(n_vecs) (seed writes
    # one part file per bucket; a layout change that breaks the 1:1
    # should fail here loudly and update this gate with its rationale).
    if art_rel == "BENCH_scale_docs.json" and os.path.exists(art_path):
        ex = art.get("extras", {})
        n_vecs = ex.get("n_vecs")
        files_total = ex.get("hn_byid_files_total")
        if n_vecs is not None and files_total is not None:
            p = 64
            target = (int(n_vecs) + 3999) // 4000
            while p < target and p < 65536:
                p <<= 1
            if int(files_total) != p:
                print(f"[scale-artifact] FAIL {art_rel}: hn_byid_files_total="
                      f"{files_total} but deriveBuckets({n_vecs})={p} — the "
                      f"committed receipt predates the derived sidecar layout")
                rc = 1
            else:
                print(f"[scale-artifact] ok {art_rel}: hn_byid_files_total "
                      f"matches deriveBuckets({n_vecs})={p}")
sys.exit(rc)

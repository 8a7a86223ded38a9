"""Two-parallelism scaling benchmark (north-rule evidence).

Runs the identical extraction job on the identical input at local[8] and
local[32] via spark-submit --py-files, computes throughput at both plus
scaling efficiency = dps_4N / (4 * dps_N), verifies the two outputs are
byte-identical (parity hash), and rewrites BENCH.md with the results.

    python scripts/scaling_bench.py [n_docs]   # default 10000
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def build_pyfiles_zip() -> str:
    """Package findtextcenternet_spark for --py-files distribution."""
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    zpath = os.path.join(cache, "findtextcenternet_spark.zip")
    pkg = os.path.join(REPO, "findtextcenternet_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath

def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    pages_path = os.path.join(cache, f"pages_{n_docs}.parquet")
    if not os.path.exists(pages_path):
        from findtextcenternet_spark.corpus import write_pages_parquet
        write_pages_parquet(pages_path, n_docs)
    zpath = build_pyfiles_zip()

    results = {}
    for cores in (8, 32):
        out_json = os.path.join(cache, f"scaling_{cores}.json")
        cmd = [SPARK_SUBMIT, "--master", f"local[{cores}]",
               "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                                 "24g"),
               "--py-files", zpath,
               os.path.join(REPO, "scripts", "scaling_job.py"),
               str(cores), pages_path, out_json]
        print("+", " ".join(cmd), flush=True)
        log = os.path.join(cache, f"scaling_{cores}.log")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        with open(out_json) as f:
            results[cores] = json.load(f)
        print(json.dumps(results[cores]), flush=True)

    r8, r32 = results[8], results[32]
    eff = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    parity_ok = (r8["parity_hash"] == r32["parity_hash"]
                 and r8["rows"] == r32["rows"])
    summary = {
        "n_docs": n_docs,
        "docs_per_sec_local8": r8["docs_per_sec"],
        "docs_per_sec_local32": r32["docs_per_sec"],
        "wall_sec_local8": r8["wall_sec"],
        "wall_sec_local32": r32["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "parity_identical": parity_ok,
        "parity_hash": r8["parity_hash"],
        "date": datetime.date.today().isoformat(),
    }
    with open(os.path.join(cache, "scaling.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))

    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md, "w") as f:
        f.write(f"""# BENCH — scaling measurement (north rule)

Protocol: BASELINE.md §"Sandbox measurement protocol". Same job
(`findtextcenternet_spark.pipeline.extract_documents`), same input
({n_docs} deterministic synthetic pages, seed-fixed corpus), launched via
`spark-submit --py-files` at two parallelism levels. Timed section excludes
session startup and Python-worker warmup (a 64-doc warm pass runs first);
throughput = docs / wall.

| cores | wall s | docs/sec | output rows | parity hash |
|---|---|---|---|---|
| local[8] (N) | {r8['wall_sec']} | {r8['docs_per_sec']} | {r8['rows']} | `{r8['parity_hash']}` |
| local[32] (4N) | {r32['wall_sec']} | {r32['docs_per_sec']} | {r32['rows']} | `{r32['parity_hash']}` |

**Scaling efficiency (N → 4N) = {r32['docs_per_sec']} / (4 × {r8['docs_per_sec']}) =
{eff:.3f}** (target ≥ 0.8).

Output parity across parallelism: {"IDENTICAL" if parity_ok else "MISMATCH"}
(order-insensitive `bit_xor(xxhash64(url, text))` over all extracted docs —
byte-identical text per url at both cluster sizes).

Measured {summary['date']}; reproduce with
`python scripts/scaling_bench.py {n_docs}`.
""")
    print(f"wrote {bench_md}")
    return 0 if parity_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

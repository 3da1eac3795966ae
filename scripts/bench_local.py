#!/usr/bin/env python3
"""Fresh-JVM local bench table (VERDICT r10 item 9: machine-readable
BENCH_LOCAL_r{N}.json next to BENCH_NOTES).

Protocol: take a full-suite bench JSON (one crowded JVM over every
query), select the queries above a threshold (default 1.0 s in-suite),
and re-time each in its own fresh JVM — the top singles individually,
the cheap tail in small groups (shared JVM warmup amortized, marked
`grouped`). Emits BENCH_LOCAL_r{N}.json:

  {"sf": "...", "suite_total_sec": T, "suite_json": "...",
   "queries": {name: {"suite_sec": s, "fresh_jvm_sec": f, "grouped": bool}}}

Usage:
  python3 scripts/bench_local.py <suite.json> <out.json> [--threshold 1.0]
    [--singles 12] [--group-size 8]
"""
import json, subprocess, sys, os

OPENS = " ".join(
    f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"])


def run_bench(queries, sf_dir):
    cmd = (
        f"java {OPENS} -XX:ReservedCodeCacheSize=1g -Xmx8g "
        f"-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "
        f"-cp target/scala-2.13/classes:/opt/spark/jars/* graft.Bench "
        + " ".join(queries))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    for attempt in range(2):
        out = subprocess.run(cmd, shell=True, env=env, capture_output=True,
                             text=True, timeout=1800)
        lines = out.stdout.strip().splitlines()
        if lines:
            try:
                return json.loads(lines[-1])["queries"]
            except (json.JSONDecodeError, KeyError):
                pass
        print(f"attempt {attempt} failed for {queries}; stderr tail: "
              f"{out.stderr[-500:]}", flush=True)
    return {q: None for q in queries}


def main():
    args = sys.argv[1:]
    suite_path, out_path = args[0], args[1]
    def opt(name, default):
        return type(default)(args[args.index(name) + 1]) if name in args else default
    threshold = opt("--threshold", 1.0)
    n_singles = opt("--singles", 12)
    group_size = opt("--group-size", 8)

    suite = json.load(open(suite_path))
    # the sf label may be a testdata subdir name, the sf1 replica's dir
    # name ("graft_sf1" -> /tmp/graft_sf1), or an absolute path
    sf = suite["sf"]
    sf_dir = sf if sf.startswith("/") else (
        "/tmp/graft_sf1" if sf == "graft_sf1" else f"/root/testdata/{sf}")
    # suite keys may be shortened ("qNN"); recover full names from the
    # registry. Only the quoted name right after `GraftQuery(` counts —
    # a bare repo-wide grep also matches observe() metric names etc.
    # (q77_train_grams once shadowed q77_bloom_decontaminate and nulled
    # a whole bench group when Bench rejected the unknown name).
    names = {}
    reg = subprocess.run(
        "grep -rhoPzo 'GraftQuery\\(\\s*\"\\Kq[0-9]+_[a-z0-9_]+' "
        "src/main/scala/graft --include=*.scala | tr '\\0' '\\n'",
        shell=True, capture_output=True, text=True).stdout.split()
    for n in set(reg):
        qnum = n.split("_")[0]
        names[qnum] = n          # "q146" (keyMode 1)
        names[qnum[1:]] = n      # bare "146" (keyMode 2)
    full = {names.get(k, k): v for k, v in suite["queries"].items()}

    slow = sorted(((k, v) for k, v in full.items() if v >= threshold),
                  key=lambda kv: -kv[1])
    singles = [k for k, _ in slow[:n_singles]]
    tail = [k for k, _ in slow[n_singles:]]
    groups = [tail[i:i + group_size] for i in range(0, len(tail), group_size)]

    result = {}
    for q in singles:
        sec = run_bench([q], sf_dir)
        key = next(iter(sec))
        result[q] = {"suite_sec": full[q],
                     "fresh_jvm_sec": sec.get(key), "grouped": False}
        print(f"single {q}: {sec.get(key)}", flush=True)
    for g in groups:
        secs = run_bench(g, sf_dir)
        secs = {names.get(k, k): v for k, v in secs.items()}
        for q in g:
            result[q] = {"suite_sec": full[q],
                         "fresh_jvm_sec": secs.get(q), "grouped": True}
        print(f"group {g}: {secs}", flush=True)

    json.dump({"sf": suite["sf"], "suite_total_sec": suite["value"],
               "threshold_sec": threshold,
               "protocol": "fresh JVM per row; grouped rows share one JVM "
                           "(warmup amortized); suite_sec is the crowded "
                           "full-suite number for comparison",
               "queries": result},
              open(out_path, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(result)} queries)")


if __name__ == "__main__":
    main()

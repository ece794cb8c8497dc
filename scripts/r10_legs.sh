#!/bin/bash
# r10 measurement legs — run SEQUENTIALLY on an idle host (no sbt lock:
# invokes graft mains via plain java on the compiled classes).
#
#   scripts/r10_legs.sh fold       # fold newest BENCH_r*.json from target/bench.json
#   scripts/r10_legs.sh zipfgen    # generate the Zipf-vocabulary bench fixtures
#   scripts/r10_legs.sh bm25zipf   # task-1 bm25 build/probe/full on zipf fixtures
#   scripts/r10_legs.sh starprobe  # task-2 sf100 star probes, SPARK_GRAFT_BROADCAST=auto
#   scripts/r10_legs.sh minhash128 # task-4 128-partition anomaly, AQE logs, 160 bracket
#   scripts/r10_legs.sh sf100idx   # task-5 fifth-decade standing-index probe legs
#   scripts/r10_legs.sh hits100    # task-6 early-stop HITS fifth-decade row
#
# Leg hygiene (the verify skill's rules, r9 ADVICE medium): >=150 s
# settle between 32g bench JVMs — a big JVM's exit triggers minutes of
# kernel page reclaim that inflates the next leg's early keys up to
# ~2x; and a leg JVM's own exit status is checked (set -o pipefail plus
# `| grep || true` silently swallowed an OOMed leg — r9 ADVICE low).
set -euo pipefail
cd /root/repo
ADDOPENS=$(cat scripts/addopens.txt)   # checked in (r9 ADVICE: /tmp copy was unreproducible)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

# Legs are GLOBALLY SERIALIZED (r10 incident): standing-index bench
# keys rebuild the same spark-warehouse tables, and two overlapping
# leg JVMs made one leg fail loudly and the other silently probe the
# wrong corpus's index (BASELINE r10 two-phase section).
# (anchored on the java executable: a plain `pgrep -f graft.Bench`
# self-matches shell wrappers whose argv embeds this script's text)
if pgrep -f "^java .*graft\.Bench" >/dev/null 2>&1; then
  echo "refusing to start: another graft.Bench JVM is alive (legs are serialized)" >&2
  exit 3
fi

run_main() { # heap class args...
  local heap="$1" cls="$2"; shift 2
  java -Xmx"$heap" $ADDOPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" "$cls" "$@"
}

run_leg() { # heap sfdir out shuffle keys...
  local heap="$1" sfdir="$2" out="$3" shuffle="$4"; shift 4
  local envs=(SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$out")
  [ "$shuffle" != "default" ] && envs+=(SPARK_GRAFT_SHUFFLE="$shuffle")
  echo "=== leg: $out (heap=$heap shuffle=$shuffle) $*"
  local log
  log=$(mktemp /tmp/r10_leg.XXXXXX.log)
  # capture the JVM's own exit status — never masked by the grep below
  local st=0
  env "${envs[@]}" ${LEG_EXTRA_ENV:+env $LEG_EXTRA_ENV} java -Xmx"$heap" $ADDOPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "$@" >"$log" 2>&1 || st=$?
  if [ "$st" -ne 0 ]; then
    echo "LEG FAILED (exit $st): $out — tail of log:" >&2
    tail -30 "$log" >&2
    exit 1
  fi
  grep -E "\[bench\]" "$log" || true
  # LEG_KEEP_LOG: preserve the full JVM log beside the artifact (the
  # AQE-diagnosis legs need the DEBUG coalesce lines, not just [bench])
  if [ -n "${LEG_KEEP_LOG:-}" ]; then
    mv "$log" "${out%.json}.log"
  else
    rm -f "$log"
  fi
}

settle() { echo "--- settle 150 s (leg hygiene)"; sleep 150; }

# constant key sets
BM25K="bench_bm25_index_build_full bench_bm25_index_probe_full \
bench_bm25_index_probe_seldf_full bench_bm25_full"

case "${1:?mode}" in
  fold)
    # task-3 automation: driver BENCH_r{N}.json stdout tails truncate
    # (three rounds running); target/bench.json is authoritative for
    # the same run_id. Run this at round start for the previous
    # round's record (the driver writes it after the build turns end).
    latest=$(ls BENCH_r*.json | sort | tail -1)
    python3 scripts/fold_bench.py "$latest" target/bench.json
    ;;
  zipfgen)
    # Zipf-vocabulary documents-only bench fixtures (task 1): the
    # gated sf dirs stay untouched. Heaps vocab: 50k terms at zf01,
    # x sqrt(10) per decade.
    run_main 16g graft.sources.FixtureGen /root/testdata/sf0.1 /tmp/zf01 1    zipf
    run_main 16g graft.sources.FixtureGen /root/testdata/sf0.1 /tmp/zf1  10   zipf
    run_main 16g graft.sources.FixtureGen /root/testdata/sf0.1 /tmp/zf10 100  zipf
    run_main 32g graft.sources.FixtureGen /root/testdata/sf0.1 /tmp/zf100 1000 zipf
    du -sh /tmp/zf*
    ;;
  bm25zipf)
    # v2: first-cut legs (r10_bm25z_*) measured a probe floor from the
    # take(cap+1) incremental-limit jobs + the redundant df semi-join;
    # both fixed (single collect_set job, pushdown skips the semi-join)
    # and the seldf (stopword-pruned) row added
    run_leg 32g /tmp/zf01 bench/r10/r10_bm25z2_zf01.json default $BM25K
    settle
    run_leg 32g /tmp/zf1  bench/r10/r10_bm25z2_zf1.json  default $BM25K
    settle
    run_leg 32g /tmp/zf10 bench/r10/r10_bm25z2_zf10.json default $BM25K
    ;;
  bm25two)
    # the exact two-phase MaxScore probe beside the one-phase exact and
    # pruned rows (bm25z3 series); zf100 re-runs only the cheap rows —
    # the one-phase exact zf100 number stands in bm25z2
    K2="bench_bm25_index_build_full bench_bm25_index_probe_full \
bench_bm25_index_probe_seldf_full bench_bm25_index_probe_2p_full \
bench_bm25_index_probe_shortq_full bench_bm25_index_probe_2p_shortq_full"
    run_leg 32g /tmp/zf1  bench/r10/r10_bm25z3_zf1.json  default $K2
    settle
    run_leg 32g /tmp/zf10 bench/r10/r10_bm25z3_zf10.json default $K2
    settle
    run_leg 32g /tmp/zf100 bench/r10/r10_bm25z3_zf100.json default \
      bench_bm25_index_build_full bench_bm25_index_probe_seldf_full \
      bench_bm25_index_probe_2p_full \
      bench_bm25_index_probe_shortq_full bench_bm25_index_probe_2p_shortq_full
    ;;
  bm25bmx)
    # exact block-max probe (bm25z4): the always-exact pruned serving
    # row beside the one-phase exact and the short-query pair; zf100
    # skips the 443 s one-phase long-query row (stands in bm25z2) and
    # the 70.8 s one-phase shortq row (stands in bm25z3)
    K4="bench_bm25_index_build_full bench_bm25_index_probe_full \
bench_bm25_index_probe_bmx_full bench_bm25_index_probe_shortq_full \
bench_bm25_index_probe_bmx_shortq_full"
    run_leg 32g /tmp/zf1  bench/r10/r10_bm25z4_zf1.json  default $K4
    settle
    run_leg 32g /tmp/zf10 bench/r10/r10_bm25z4_zf10.json default $K4
    settle
    run_leg 32g /tmp/zf100 bench/r10/r10_bm25z4_zf100.json default \
      bench_bm25_index_build_full bench_bm25_index_probe_bmx_full \
      bench_bm25_index_probe_bmx_shortq_full
    ;;
  bm25zipf100)
    # fifth decade of the bm25 standing index on the zipf fixture —
    # separated from bm25zipf so the disk high-water mark is observable
    run_leg 32g /tmp/zf100 bench/r10/r10_bm25z2_zf100.json default $BM25K
    ;;
  starprobe)
    # the r9 weak: q3 star probe crossed the broadcast->SMJ cliff at
    # sf100 (2.25 s -> 60.5 s). auto scales autoBroadcastJoinThreshold
    # with input bytes (dirBytes/64, 10 MB floor, 512 MB cap).
    LEG_EXTRA_ENV="SPARK_GRAFT_BROADCAST=auto" \
      run_leg 32g /tmp/sf100 bench/r10/r10_star_sf100_bauto.json default \
      tpcds_q3_star_probe tpcds_q55_brand_probe tpcds_q98_revenue_share
    ;;
  minhash128)
    # the unexplained reproducible 155 s at initialPartitionNum=128 vs
    # ~92 s at 32/256 (BASELINE.md r9): one leg at 128 with AQE
    # coalesce logging, one at 160 to bracket
    LEG_EXTRA_ENV="SPARK_GRAFT_AQE_LOG=1" LEG_KEEP_LOG=1 \
      run_leg 32g /tmp/sf10 bench/r10/r10_mh128_sf10.json 128 \
      bench_minhash_rowlocal_full
    settle
    LEG_EXTRA_ENV="SPARK_GRAFT_AQE_LOG=1" LEG_KEEP_LOG=1 \
      run_leg 32g /tmp/sf10 bench/r10/r10_mh160_sf10.json 160 \
      bench_minhash_rowlocal_full
    ;;
  sf100idx)
    # fifth-decade standing-index probe (task 5): the minhash dedup
    # index family on the relational sf100 fixture (the r9 attempt hit
    # the 49 GB scratch ceiling on the degenerate-vocabulary spill)
    run_leg 32g /tmp/sf100 bench/r10/r10_idxprobe_sf100.json default \
      bench_index_probe_full bench_approx_distinct_full
    ;;
  hits100)
    run_leg 32g /tmp/sf100 bench/r10/r10_hits_sf100.json default \
      bench_hits_report_full graph_hits
    ;;
  optlegs)
    # optimization-session targeted legs (perplexity-threshold driver
    # fold + graph edge checkpoint). This mode emits ONLY the
    # r10_opt_after_sf01.json leg: the committed before-side artifact
    # (r10_opt_before_sf01.json) was captured MANUALLY at the
    # pre-change commit (2d0ad3c^) with the same key set — re-running
    # it requires checking that commit out first (r10 ADVICE: the old
    # comment implied this script produced both). Controls included on
    # purpose.
    OK="graph_domain_rank graph_personalized_rank graph_hits \
graph_degree_stats bench_hits_report_full curate_perplexity_buckets \
bench_perplexity_full trace_normalize window_rank dedup_exact"
    run_leg 32g /root/testdata/sf0.1 \
      bench/r10/r10_opt_after_sf01.json default $OK
    ;;
  graphcurve)
    # sf1/sf10 graph legs for the edge-checkpoint change (before-side =
    # committed r8 same-heap curve legs). Fixtures regenerated via
    # zipfgen-style FixtureGen calls: <src> <out> 10|100.
    GK="graph_domain_rank graph_personalized_rank graph_hits \
graph_degree_stats bench_hits_report_full trace_normalize"
    run_leg 32g /tmp/sf1  bench/r10/r10_graph_after_sf1.json  default $GK
    settle
    run_leg 32g /tmp/sf10 bench/r10/r10_graph_after_sf10.json default $GK
    ;;
  *) echo "unknown mode $1"; exit 2;;
esac
echo "done"

#!/bin/bash
# r9 measurement legs — run SEQUENTIALLY on an idle host (no sbt lock:
# invokes graft.Bench via plain java on the compiled classes).
#
#   scripts/r9_legs.sh shuffle   # task-1 sf10 shuffle-parallelism A/B
#   scripts/r9_legs.sh bm25idx   # task-2 standing-index legs sf0.1/1/10
#   scripts/r9_legs.sh sf100     # task-6 fifth-decade select legs
#
# Artifacts land in bench/r9/. Every leg stamps shuffle_init + run_id.
set -euo pipefail
cd /root/repo
# addopens checked into the repo (r9 ADVICE: the /tmp/r9 copy made the
# recorded legs unreproducible from the repo alone)
ADDOPENS=$(cat scripts/addopens.txt)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

run_leg() { # heap sfdir out shuffle keys...
  local heap="$1" sfdir="$2" out="$3" shuffle="$4"; shift 4
  local envs=(SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$out")
  [ "$shuffle" != "default" ] && envs+=(SPARK_GRAFT_SHUFFLE="$shuffle")
  echo "=== leg: $out (heap=$heap shuffle=$shuffle) $*"
  # capture the JVM's own exit status (r9 ADVICE: `| grep || true`
  # under pipefail silently swallowed a crashed/OOMed leg)
  local log st=0
  log=$(mktemp /tmp/r9_leg.XXXXXX.log)
  env "${envs[@]}" java -Xmx"$heap" $ADDOPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "$@" >"$log" 2>&1 || st=$?
  if [ "$st" -ne 0 ]; then
    echo "LEG FAILED (exit $st): $out — tail of log:" >&2
    tail -30 "$log" >&2
    exit 1
  fi
  grep -E "\[bench\]" "$log" || true
  rm -f "$log"
}

# the r8 >10x/decade members (VERDICT r8 finding 1)
TENX="agg_approx_distinct bench_bm25_full bench_cosine_full \
bench_cosine_scaled_full bench_minhash_rowlocal_full \
bench_minhash_rowlocal_xx_full bench_winnow_xx_full"

case "${1:?mode}" in
  shuffle)
    # NOTE: >=120 s settles between the 32g legs (r9 ADVICE medium —
    # a big JVM's exit triggers minutes of kernel reclaim that can
    # inflate the next leg's early keys ~2x). The RECORDED r9 shuffle
    # legs ran back-to-back; their start probes were in the idle band
    # (BASELINE.md r9), but reruns must settle.
    run_leg 32g /tmp/sf10 bench/r9/r9_shuf_sf10_p32.json   default $TENX
    sleep 150
    run_leg 32g /tmp/sf10 bench/r9/r9_shuf_sf10_auto.json  auto    $TENX
    sleep 150
    run_leg 32g /tmp/sf10 bench/r9/r9_shuf_sf10_p256.json  256     $TENX
    ;;
  bm25idx)
    # NOTE: legs must be separated by >=120 s settles (see the verify
    # skill's leg-hygiene rule) — the recorded r9 runs were; the sf10
    # leg was re-run as r9_bm25idx_sf10b.json after a contaminated
    # start probe.
    K="bench_bm25_index_build_full bench_bm25_index_probe_full \
bench_bm25_full bench_approx_distinct_full agg_approx_distinct"
    run_leg 32g /root/testdata/sf0.1 bench/r9/r9_bm25idx_sf01.json default $K
    sleep 120
    run_leg 32g /tmp/sf1             bench/r9/r9_bm25idx_sf1.json  default $K
    sleep 120
    run_leg 32g /tmp/sf10            bench/r9/r9_bm25idx_sf10.json default $K
    ;;
  sf100)
    # flat/index families only (a full sf100 suite does not fit the
    # round); default shuffle for r8-curve comparability. The two
    # index-probe keys FAILED at sf100 on the 49 GB disk-spill
    # ceiling (BASELINE.md r9) — kept here so a larger-volume rerun
    # measures them.
    K="ann_lsh_bucketed ann_pq dedup_embedding_incremental \
bench_index_probe_full bench_bm25_index_probe_full \
bench_approx_distinct_full \
graph_degree_stats graph_domain_rank graph_hits graph_personalized_rank \
tpcds_q3_star_probe tpcds_q55_brand_probe tpcds_q88_band_counts \
tpcds_q96_pinpoint_count tpcds_q98_revenue_share"
    run_leg 32g /tmp/sf100 bench/r9/r9_curve_sf100_select.json default $K
    ;;
  *) echo "unknown mode $1"; exit 2;;
esac
echo "done"

#!/bin/bash
# r11 measurement legs — run SEQUENTIALLY on an idle host (no sbt lock:
# invokes graft mains via plain java on the compiled classes).
#
#   scripts/r11_legs.sh open      # full-suite sf0.1 leg (round-open baseline)
#   scripts/r11_legs.sh optbefore # targeted before-leg (run on r10-close classes!)
#   scripts/r11_legs.sh optafter  # targeted after-leg (r11 classes)
#   scripts/r11_legs.sh star100   # sf100 star probes at DEFAULT env (hint check)
#   scripts/r11_legs.sh graph100  # sf100 graph re-leg on the r10 checkpointed code
#   scripts/r11_legs.sh jacc10    # sf1/sf10 jaccard/containment checkpoint curve
#   scripts/r11_legs.sh close     # full-suite sf0.1 leg (round-close)
#
# Leg hygiene (verify skill): probes[0..1] <= 0.15 s or the leg is
# suspect (today's host floor read ~0.13-0.16 with an idle load avg —
# record the probes either way and compare controls); >= 150 s settle
# after any big JVM exit; legs globally serialized.
set -euo pipefail
cd /root/repo
ADDOPENS=$(cat scripts/addopens.txt)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

if pgrep -f "^java .*graft\.Bench" >/dev/null 2>&1; then
  echo "refusing to start: another graft.Bench JVM is alive (legs are serialized)" >&2
  exit 3
fi

run_leg() { # heap sfdir out keys...
  local heap="$1" sfdir="$2" out="$3"; shift 3
  echo "=== leg: $out (heap=$heap) $*"
  local log st=0
  log=$(mktemp /tmp/r11_leg.XXXXXX.log)
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$out" \
    ${LEG_EXTRA_ENV:+env $LEG_EXTRA_ENV} java -Xmx"$heap" $ADDOPENS \
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

settle() { echo "--- settle 150 s (leg hygiene)"; sleep 150; }

# the r11 targeted-opt key set (jaccard/containment checkpoint, blockmax
# opt-in build, bounded sched collect, controls)
OPTK="bench_jaccard_full bench_containment_full bench_clusters_full \
bench_bm25_index_build_full bench_bm25_index_probe_full \
bench_bm25_index_probe_bmx_full bench_bm25_index_probe_2p_full \
sched_greedy_defer trace_normalize dedup_exact window_rank"

case "${1:?mode}" in
  open)
    run_leg 32g /root/testdata/sf0.1 bench/r11/r11_open_sf01.json ;;
  optbefore)
    # NOTE: meaningful only on the r10-close classes (git checkout
    # 57fda4b + sbt compile first); the committed artifacts
    # r11_opt_before_sf01.json / r11_opt_before2_sf01.json were
    # captured that way before the r11 compile.
    run_leg 32g /root/testdata/sf0.1 bench/r11/r11_opt_before_sf01.json $OPTK ;;
  optafter)
    run_leg 32g /root/testdata/sf0.1 bench/r11/r11_opt_after_sf01.json $OPTK ;;
  star100)
    # VERDICT r10 item 1 "done" check: at DEFAULT env (no
    # SPARK_GRAFT_BROADCAST) the hinted filtered-dim probes must hold
    # ~the r10 broadcast-leg numbers; the unhinted full-dim control
    # (q55_brand) keeps its default shape
    run_leg 32g /tmp/sf100 bench/r11/r11_star_sf100_default.json \
      tpcds_q3_star_probe tpcds_q61_promo_ratio tpcds_q45_geo_membership \
      tpcds_q55_brand_probe tpcds_q98_revenue_share ;;
  graph100)
    # VERDICT r10 item 5: the r10 edge-checkpoint code measured at
    # sf100 (old-code isolated graph_hits was 46.1 s)
    run_leg 32g /tmp/sf100 bench/r11/r11_graph_sf100.json \
      bench_hits_report_full graph_hits graph_degree_stats ;;
  jacc10)
    run_leg 32g /tmp/sf1 bench/r11/r11_jacc_sf1.json \
      bench_jaccard_full bench_containment_full trace_normalize
    settle
    run_leg 32g /tmp/sf10 bench/r11/r11_jacc_sf10.json \
      bench_jaccard_full bench_containment_full trace_normalize ;;
  close)
    run_leg 32g /root/testdata/sf0.1 bench/r11/r11_close_sf01.json ;;
  *) echo "unknown mode $1"; exit 2;;
esac
echo "done"

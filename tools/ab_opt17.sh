#!/bin/bash
# Round-17 OPTIMIZATION A/B: session-start HEAD (88e63e2) vs the
# optimized body — same same-session-alternation protocol as
# tools/ab_opt16.sh (BASELINE.md standing policy: cross-code absolutes
# only from alternation). Default: the touched-operator restricted set;
# pass FULL=1 for the full suite.
# Usage: [FULL=1] [CPUS=32] tools/ab_opt17.sh [reps]
set -u
NREPS="${1:-3}"
CPUS="${CPUS:-32}"
OUT=/root/repo/target/opt17/ab${FULL:+_full}_c$CPUS
mkdir -p "$OUT"
TOUCHED="dedup_winnowing_join,text_winnowing_fingerprints,ml_pca_power_iter,text_bpe_encode,text_bpe_merge_train,dedup_fuzzy_name_join,dedup_simhash,curate_dsir_resample,curate_dsir_incremental,curate_chunk_overlap,curate_ccnet_ppl_buckets,text_token_entropy,text_zipf_alpha,text_tfidf_top_terms,text_token_stats,curate_repetition_filter,curate_softdedup_weights,curate_paragraph_dedup,text_lang_id,text_fingerprint,text_quality_score,text_heavy_hitters,text_top_bigrams,text_trigrams_generator,text_bm25_retrieval,curate_gopher_rules,curate_taxonomy_tags,curate_unigram_logprob,curate_pack_sequences,explode_outer_long_tokens,pipeline_curation_full,pipeline_training_data,dedup_substring_spans"
run () { # $1=classes $2=out
  if [ -z "${FULL:-}" ]; then export SPARK_GRAFT_BENCH_ONLY="$TOUCHED"; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$CPUS \
    /root/repo/tools/bench_once.sh "$2" "$1" >> "$OUT/ab.log" 2>&1
}
echo "start opt17 ab $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
for rep in $(seq 1 "$NREPS"); do
  run /root/repo/target/opt17/startwt/target/scala-2.13/classes "$OUT/old_rep$rep.json"
  run /root/repo/target/scala-2.13/classes "$OUT/new_rep$rep.json"
done
echo "end opt17 ab $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"

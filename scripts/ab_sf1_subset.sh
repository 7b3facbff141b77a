#!/bin/bash
# Same-day, quiet-box A/B of the 12-query sf1 subset the round-10 session
# flagged: r9 tree (/tmp/r9tree @ f8fd6be) vs the current tree, identical
# methodology (registration-order chunking N/A at 12 queries, passes=2 so
# the reported number is the warm median_low the records use).
# Usage: bash scripts/ab_sf1_subset.sh <tag> <treedir>
set -eu
TAG="$1"; TREE="$2"
QUERIES="doc_dedup_ngram_prefix,doc_containment_prefix,doc_containment_recall,bg_find,doc_dedup_ngram,doc_containment,gr_sort_limit,doc_lsh_recall,emb_ann_recall,doc_corpus_novel,doc_nb_lang,doc_source_overlap"
cd "$TREE"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_PASSES=2 \
SPARK_GRAFT_ONLY="$QUERIES" \
SPARK_GRAFT_IGNORE_SCALE_DOMAINS=1 \
python bench.py > "/tmp/ab_sf1_${TAG}.out" 2> "/tmp/ab_sf1_${TAG}.err"
echo "RC=$? tag=$TAG"

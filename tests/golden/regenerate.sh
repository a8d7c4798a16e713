#!/bin/bash
# Regenerate golden outputs from the REAL reference binary.
#
# The reference has no autotools on this box, so it is built by
# .refbuild/build_reference.sh (hand-rolled g++ build of src/ + lib/ +
# vendored jellyfish + the five needed boost libs, HAVE_PYTHON off).
# Configs mirror the reference's own shell tests
# (/root/reference/tests/test_{hist,gcp,comp,sect}.sh), with
# sect_length_test.fa standing in for the EcoliK12.fasta fixture that is
# missing from the reference checkout (SURVEY §4 gotcha), plus cold and
# filter configs for the tools the shell tests don't cover.
set -ex
KAT=/root/repo/.refbuild/bin/kat
data=/root/reference/tests/data
G=$(cd "$(dirname "$0")" && pwd)
T=$(mktemp -d)
cd $T

$KAT hist -m17 -o hist_m17 $data/ecoli_r1.1K.fastq $data/ecoli_r2.1K.fastq
$KAT hist -m27 -o hist_m27 $data/ecoli_r1.1K.fastq
$KAT hist -m17 -l 3 -h 500 -i 2 -o hist_bins $data/ecoli_r1.1K.fastq
$KAT gcp -m17 -o gcp_m17 $data/ecoli_r1.1K.fastq $data/ecoli_r2.1K.fastq
$KAT comp -m13 -n -o comp_density $data/ecoli_r1.1K.fastq $data/ecoli_r2.1K.fastq
$KAT comp -m13 -o comp_cn $data/ecoli_r1.1K.fastq $data/sect_length_test.fa
$KAT sect -o sect_jf $data/sect_length_test.fa $data/ecoli.header.jf27
$KAT sect -m17 -E -F -o sect_reads $data/sect_test.fa $data/ecoli_r1.1K.fastq
$KAT cold -m17 -o cold_m17 $data/sect_test.fa $data/ecoli_r1.1K.fastq
$KAT filter kmer -m17 --low_count 2 --high_count 100 -o fk_m17 $data/ecoli_r1.1K.fastq
$KAT filter seq -m17 -T 0.2 --stats -o fs_m17 --seq $data/sect_test.fa $data/ecoli_r1.1K.fastq
$KAT comp -m13 -o comp_3in $data/ecoli_r1.1K.fastq $data/sect_length_test.fa $data/sect_test.fa
$KAT comp -m13 -x 1.5 -y 0.5 -i 256 -j 128 -o comp_scaled $data/ecoli_r1.1K.fastq $data/ecoli_r2.1K.fastq
$KAT hist -o hist_jf $data/ecoli.header.jf27
$KAT gcp -o gcp_jf $data/ecoli.header.jf27
$KAT sect -m17 -g -E -F -o sect_gc $data/sect_test.fa $data/ecoli_r1.1K.fastq
$KAT filter seq -m17 -T 0.2 --invert -o fs_inv --seq $data/sect_test.fa $data/ecoli_r1.1K.fastq
$KAT filter seq -m17 -T 0.2 --separate -o fs_sep --seq $data/sect_test.fa $data/ecoli_r1.1K.fastq

rm -rf "$G"/out
mkdir -p "$G"/out
# Everything the runs produced, except jellyfish binary dumps from input
# counting (those are covered separately by the .jf codec tests).
cp hist_m17 hist_m27 hist_bins "$G"/out/
cp gcp_m17.mx "$G"/out/
cp comp_density-main.mx comp_density.stats "$G"/out/
cp comp_cn-main.mx comp_cn.stats "$G"/out/
# NOTE: the reference binary never writes <prefix>-contamination.mx —
# Sect::main does not call Sect::save() (sect.cc:127 is dead code; compare
# histogram.cc:360 / comp.cc:827 / gcp.cc:357 which do call save()).  Our
# CLI still emits it as a feature; goldens only cover what the binary makes.
cp sect_jf-counts.cvg sect_jf-stats.tsv "$G"/out/
cp sect_reads-counts.cvg sect_reads-stats.tsv "$G"/out/
cp sect_reads-repetitive.fa sect_reads-non_repetitive.fa "$G"/out/ 2>/dev/null || true
cp sect_gc-counts.gc sect_gc-counts.cvg sect_gc-stats.tsv "$G"/out/
cp cold_m17-stats.tsv "$G"/out/
cp comp_3in-main.mx comp_3in-ends.mx comp_3in-middle.mx comp_3in-mixed.mx \
   comp_3in.stats "$G"/out/
cp comp_scaled-main.mx comp_scaled.stats "$G"/out/
cp hist_jf gcp_jf.mx "$G"/out/
ls fk_m17* fs_m17* || true
for f in fk_m17* fs_m17* fs_inv* fs_sep*; do cp "$f" "$G"/out/; done
ls -la "$G"/out
rm -rf $T

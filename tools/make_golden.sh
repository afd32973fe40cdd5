#!/bin/sh
# Regenerate golden reference outputs (run from tests/fixtures).
set -e
REF=/tmp/refbuild/jpeg2png
mkdir -p golden
for f in lineart64_q20_420 lineart64_q50_444 photo80_q30_422 \
         odd100x52_q25_420 lineart64_q20_420_prog; do
  $REF $f.jpg -o golden/${f}_i5.png -i 5 -c golden/${f}_i5.csv -q
  $REF $f.jpg -o golden/${f}_i50.png -q
done
$REF lineart64_q20_420.jpg -o golden/lineart64_q20_420_w0_i5.png -w 0 -i 5 -c golden/lineart64_q20_420_w0_i5.csv -q
$REF lineart64_q20_420.jpg -o golden/lineart64_q20_420_p0_i5.png -p 0 -i 5 -c golden/lineart64_q20_420_p0_i5.csv -q
$REF lineart64_q20_420.jpg -o golden/lineart64_q20_420_s_i5.png -s -i 5 -c golden/lineart64_q20_420_s_i5.csv -q
$REF lineart64_q20_420.jpg -o golden/lineart64_q20_420_16b_i5.png -1 -i 5 -q

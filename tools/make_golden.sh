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
# 4:4:0 (sy=2, sx=1 chroma) fixture from tools/tiny_jpeg.py — the
# anisotropic-footprint case compute.c:349-403 that PIL cannot emit
$REF art120x88_q40_440.jpg -o golden/art120x88_q40_440_i5.png -i 5 -c golden/art120x88_q40_440_i5.csv -q
$REF art120x88_q40_440.jpg -o golden/art120x88_q40_440_i50.png -q
# separate-components with per-channel triples (jpeg2png.c:207-244)
$REF lineart64_q20_420.jpg -o golden/lineart64_q20_420_striple_i543.png \
    -s -w 0.5,0.2,0.1 -p 0.002,0.001,0.0005 -i 5,4,3 \
    -c golden/lineart64_q20_420_striple_i543.csv -q
# 4:1:1 (sy=1, sx=4 chroma): widest horizontal footprint
$REF art128x96_q35_411.jpg -o golden/art128x96_q35_411_i5.png -i 5 -c golden/art128x96_q35_411_i5.csv -q
$REF art128x96_q35_411.jpg -o golden/art128x96_q35_411_i50.png -q

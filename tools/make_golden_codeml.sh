#!/bin/bash
# Golden lnL values from the reference codeml over model configurations.
# Output: tests/golden_codeml.json
set -e
BIN=/tmp/pamlbuild/src/codeml
EX=/root/reference/examples
OUT=$(cd "$(dirname "$0")/.." && pwd)/tests/golden_codeml.json
WORK=$(mktemp -d)
cd "$WORK"

echo "{" > "$OUT"
first=1

run_case() {
  name=$1; seq=$2; tree=$3; extra="$4"
  cat > codeml.ctl <<EOF
seqfile = $seq
treefile = $tree
outfile = mlc
noisy = 0
verbose = 1
runmode = 0
seqtype = 1
CodonFreq = 2
clock = 0
aaDist = 0
model = 0
NSsites = 0
icode = 0
Mgene = 0
fix_kappa = 0
kappa = 2
fix_omega = 0
omega = .4
fix_alpha = 1
alpha = 0
Malpha = 0
ncatG = 3
getSE = 0
RateAncestor = 0
Small_Diff = .5e-6
cleandata = 1
method = 0
$extra
EOF
  timeout 2400 $BIN codeml.ctl > /dev/null 2>&1 || { echo "FAIL $name" >&2; return; }
  line=$(grep -m1 "^lnL" mlc)
  lnl=$(echo "$line" | sed 's/.*np: *[0-9]*): *//' | awk '{print $1}')
  np=$(echo "$line" | sed 's/.*np: *\([0-9]*\)).*/\1/')
  if [ $first -eq 0 ]; then echo "," >> "$OUT"; fi
  first=0
  printf '"%s": {"lnL": %s, "np": %s}' "$name" "$lnl" "$np" >> "$OUT"
  echo "$name lnL=$lnl np=$np" >&2
}

# M0 with different frequency models on abglobin
run_case m0_f3x4_abglobin   $EX/abglobin.nuc $EX/abglobin.trees ""
run_case m0_fequal_abglobin $EX/abglobin.nuc $EX/abglobin.trees "CodonFreq = 0"
run_case m0_f1x4_abglobin   $EX/abglobin.nuc $EX/abglobin.trees "CodonFreq = 1"
run_case m0_fcodon_abglobin $EX/abglobin.nuc $EX/abglobin.trees "CodonFreq = 3"
run_case m0_f3x4mg_abglobin $EX/abglobin.nuc $EX/abglobin.trees "CodonFreq = 5"
run_case m0_f1x4mg_abglobin $EX/abglobin.nuc $EX/abglobin.trees "CodonFreq = 4"
# mtCDNApri: mito code, checked-in values in examples/mtCDNA/AAcodon.result.txt
run_case m0_fequal_mtcdna   $EX/mtCDNA/mtCDNApri.nuc $EX/mtCDNA/mtCDNApri.trees "icode = 1
CodonFreq = 0"
run_case m0_f3x4_mtcdna     $EX/mtCDNA/mtCDNApri.nuc $EX/mtCDNA/mtCDNApri.trees "icode = 1"
# NSsites on lysozyme (small: 7 taxa x 130 codons)
LYS=$EX/lysozyme
run_case m1a_lysozyme  $LYS/lysozymeSmall.nuc $LYS/lysozymeSmall.trees "NSsites = 1"
run_case m2a_lysozyme  $LYS/lysozymeSmall.nuc $LYS/lysozymeSmall.trees "NSsites = 2"
run_case m3k3_lysozyme $LYS/lysozymeSmall.nuc $LYS/lysozymeSmall.trees "NSsites = 3"
run_case m7_lysozyme   $LYS/lysozymeSmall.nuc $LYS/lysozymeSmall.trees "NSsites = 7
ncatG = 10"
run_case m8_lysozyme   $LYS/lysozymeSmall.nuc $LYS/lysozymeSmall.trees "NSsites = 8
ncatG = 10"

echo "" >> "$OUT"
echo "}" >> "$OUT"
echo "wrote $OUT" >&2

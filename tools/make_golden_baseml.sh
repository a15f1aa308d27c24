#!/bin/bash
# Generate golden lnL values by running the reference baseml (built from
# /root/reference/src into /tmp/pamlbuild) over model configurations.
# Output: tests/golden_baseml.json
set -e
BIN=/tmp/pamlbuild/src/baseml
EX=/root/reference/examples
OUT=$(cd "$(dirname "$0")/.." && pwd)/tests/golden_baseml.json
WORK=$(mktemp -d)
cd "$WORK"

echo "{" > "$OUT"
first=1

run_case() {
  name=$1; seq=$2; tree=$3; model=$4; alpha=$5; ncatg=$6; fixalpha=$7; extra="$8"
  cat > baseml.ctl <<EOF
seqfile = $seq
treefile = $tree
outfile = mlb
noisy = 0
verbose = 1
runmode = 0
model = $model
Mgene = 0
clock = 0
fix_kappa = 0
kappa = 5
fix_alpha = $fixalpha
alpha = $alpha
Malpha = 0
ncatG = $ncatg
fix_rho = 1
rho = 0
nparK = 0
nhomo = 0
getSE = 0
RateAncestor = 0
Small_Diff = 7e-6
cleandata = 1
method = 0
$extra
EOF
  timeout 600 $BIN baseml.ctl > /dev/null 2>&1 || { echo "FAIL $name" >&2; return; }
  line=$(grep -m1 "^lnL" mlb)
  lnl=$(echo "$line" | sed 's/.*np: *[0-9]*): *//' | awk '{print $1}')
  np=$(echo "$line" | sed 's/.*np: *\([0-9]*\)).*/\1/')
  # parameter line follows branch lengths
  params=$(grep -A3 "^lnL" mlb | tail -1 | tr -s ' ')
  if [ $first -eq 0 ]; then echo "," >> "$OUT"; fi
  first=0
  printf '"%s": {"lnL": %s, "np": %s}' "$name" "$lnl" "$np" >> "$OUT"
  echo "$name lnL=$lnl np=$np" >&2
}

run_case jc69_brown   $EX/brown.nuc $EX/brown.trees 0 0 5 1 ""
run_case k80_brown    $EX/brown.nuc $EX/brown.trees 1 0 5 1 ""
run_case f81_brown    $EX/brown.nuc $EX/brown.trees 2 0 5 1 ""
run_case f84_brown    $EX/brown.nuc $EX/brown.trees 3 0 5 1 ""
run_case hky_brown    $EX/brown.nuc $EX/brown.trees 4 0 5 1 ""
run_case t92_brown    $EX/brown.nuc $EX/brown.trees 5 0 5 1 ""
run_case tn93_brown   $EX/brown.nuc $EX/brown.trees 6 0 5 1 ""
run_case rev_brown    $EX/brown.nuc $EX/brown.trees 7 0 5 1 ""
run_case unrest_brown $EX/brown.nuc $EX/brown.trees 8 0 5 1 ""
run_case hky_g5_brown $EX/brown.nuc $EX/brown.trees 4 0.5 5 0 ""
run_case rev_g5_brown $EX/brown.nuc $EX/brown.trees 7 0.5 5 0 ""
run_case jc69_g5_brown $EX/brown.nuc $EX/brown.trees 0 0.5 5 0 ""
run_case k80_g8_brown $EX/brown.nuc $EX/brown.trees 1 0.5 8 0 ""

echo "" >> "$OUT"
echo "}" >> "$OUT"
echo "wrote $OUT" >&2

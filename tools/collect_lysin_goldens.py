"""Collect lysin NSsites goldens from fresh reference-binary runs into
tests/golden_lysin.json.

Usage: python tools/collect_lysin_goldens.py /tmp/ref_lysin1/mlc \
           /tmp/ref_lysin2/mlc

Parses the reference codeml batch output ('NSsites Model N: ...' blocks
with 'lnL(ntime: ...: VALUE') produced by an `NSsites = 0 1 2 ...` run
with ncatG = 10 on examples/lysin (see tests/test_mhc_lysin.py).
"""
import json
import os
import re
import sys

NAMES = {0: "M0", 1: "M1a", 2: "M2a", 3: "M3", 4: "M4", 5: "M5",
         6: "M6", 7: "M7", 8: "M8", 9: "M9", 10: "M10", 11: "M11",
         12: "M12", 13: "M13"}


def main(paths):
    out = {}
    for p in paths:
        text = open(p).read()
        blocks = re.split(r"NSsites Model\s+(\d+):", text)
        for i in range(1, len(blocks), 2):
            model = int(blocks[i])
            m = re.search(r"lnL\(ntime:.*?\):\s*(-\d+\.\d+)",
                          blocks[i + 1])
            if m:
                out[NAMES[model]] = {"NSsites": model, "ncatG": 10,
                                     "lnL": float(m.group(1))}
    dest = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_lysin.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} goldens -> {dest}")
    for k, v in sorted(out.items()):
        print(f"  {k}: {v['lnL']}")


if __name__ == "__main__":
    main(sys.argv[1:])

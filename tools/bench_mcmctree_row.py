"""Re-run the mcmctree DatingSoftBound row of BENCH_EXAMPLES.json
standalone (ours on CPU + reference binary with PATH set so its
usedata=3 stage can shell out to baseml), and merge the result in.

Usage: python tools/bench_mcmctree_row.py
"""
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF = "/root/reference/examples"
REFBIN = "/tmp/pamlbuild/src"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from paml_tpu.apps.mcmctree import run_ctl
    from paml_tpu.io import ctl as ctlmod

    src = f"{REF}/DatingSoftBound"
    its = 500 + 2 * 2000
    row = {}
    with tempfile.TemporaryDirectory() as d:
        text = open(f"{src}/mcmctree.ctl").read()
        text = text.replace("= mtCDNApri123.txt",
                            f"= {src}/mtCDNApri123.txt")
        text = text.replace("= mtCDNApri.trees",
                            f"= {src}/mtCDNApri.trees")
        ctl = f"{d}/mcmctree.ctl"
        open(ctl, "w").write(text)
        cwd = os.getcwd()
        os.chdir(d)
        try:
            opts = ctlmod.read_ctl(ctl)
            opts["usedata"] = "2"
            opts["burnin"] = "500"
            opts["nsample"] = "2000"
            opts["sampfreq"] = "2"
            t0 = time.perf_counter()
            run_ctl(opts, ctl, progress=False)
            wall = time.perf_counter() - t0
        finally:
            os.chdir(cwd)
        row["ours"] = dict(wall_s=round(wall, 2), iterations=its,
                           it_per_s=round(its / wall, 2))
        if os.path.exists(f"{REFBIN}/mcmctree"):
            rd = os.path.join(d, "refrun")
            os.makedirs(rd, exist_ok=True)
            rtext = re.sub(r"usedata\s*=\s*\d", "usedata = 3", text)
            open(f"{rd}/run.ctl", "w").write(rtext)
            env = dict(os.environ,
                       PATH=f"{REFBIN}:" + os.environ.get("PATH", ""))
            try:
                subprocess.run([f"{REFBIN}/mcmctree", "run.ctl"],
                               cwd=rd, stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL, timeout=1800,
                               check=True, env=env)
                shutil.copy(f"{rd}/out.BV", f"{rd}/in.BV")
                rtext2 = re.sub(r"usedata\s*=\s*\d", "usedata = 2", rtext)
                rtext2 = re.sub(r"burnin\s*=\s*\d+", "burnin = 500",
                                rtext2)
                rtext2 = re.sub(r"sampfreq\s*=\s*\d+", "sampfreq = 2",
                                rtext2)
                rtext2 = re.sub(r"nsample\s*=\s*\d+", "nsample = 2000",
                                rtext2)
                open(f"{rd}/run.ctl", "w").write(rtext2)
                t0 = time.perf_counter()
                subprocess.run([f"{REFBIN}/mcmctree", "run.ctl"],
                               cwd=rd, stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL, timeout=3600,
                               check=True, env=env)
                rwall = time.perf_counter() - t0
                row["reference"] = dict(wall_s=round(rwall, 2),
                                        iterations=its,
                                        it_per_s=round(its / rwall, 2))
            except Exception as e:
                row["reference"] = dict(error=str(e)[:200])
    out = {}
    if os.path.exists("BENCH_EXAMPLES.json"):
        out = json.load(open("BENCH_EXAMPLES.json"))
    out["mcmctree_approx_DatingSoftBound"] = row
    with open("BENCH_EXAMPLES.json", "w") as f:
        json.dump(out, f, indent=1)
    print("mcmctree row:", row)


if __name__ == "__main__":
    main()

"""Control-file reader compatible with the reference's `key = value`
format (reference: GetOptions in each program, e.g. src/codeml.c:1694;
`*` and `#` start comments; some values are structured, e.g.
'ndata 3 maintree 1').
"""
from __future__ import annotations

import os
import re


def read_ctl(path: str) -> dict:
    """Parse a control file into {key: string_value} (values untyped)."""
    opts: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            # strip comments
            for cc in ("*", "#", "//"):
                idx = line.find(cc)
                if idx >= 0:
                    line = line[:idx]
            if "=" not in line:
                continue
            key, val = line.split("=", 1)
            key = key.strip()
            val = val.strip()
            if key:
                opts[key] = val
    return opts


def _num(v: str):
    try:
        return int(v)
    except ValueError:
        return float(v)


def _first_num(v: str):
    m = re.match(r"[-+0-9.eE]+", v.strip())
    return _num(m.group(0)) if m else 0


def _ndata_mode(v: str) -> str:
    """'ndata = 3 [separate_trees | maintree [0|1]]' (reference:
    examples/ndata/README.txt, codeml.c:1739-1747)."""
    toks = str(v).split()
    if len(toks) < 2:
        return "shared"
    if toks[1].startswith("separate"):
        return "separate_trees"
    if toks[1].startswith("maintree"):
        return "maintree"
    return "shared"


def resolve_path(base_ctl: str, p: str) -> str:
    """Paths in ctl files are relative to the ctl file's directory."""
    if os.path.isabs(p):
        return p
    return os.path.normpath(os.path.join(os.path.dirname(
        os.path.abspath(base_ctl)), p))


CODON_FREQ_BY_INDEX = ["Fequal", "F1x4", "F3x4", "Fcodon",
                       "F1x4MG", "F3x4MG", "FMutSel0", "FMutSel"]
NUC_MODEL_BY_INDEX = ["JC69", "K80", "F81", "F84", "HKY85", "T92", "TN93",
                      "REV", "UNREST", "REVu", "UNRESTu"]


def parse_step_matrix(val: str, symmetric: bool):
    """Parse the REVu/UNRESTu constraint spec after the model number:
    'model = 9 [2 (TA TC TG CA CG) (AG)]' -> nrate=2, step[4,4] with
    1-based rate indices per cell, 0 for the default rate (reference:
    GetStepMatrix, src/baseml.c:912; base order TCAG).  REVu assigns
    pairs symmetrically; UNRESTu directionally."""
    import numpy as np

    m = re.search(r"\[\s*(\d+)(.*)", val, re.S)
    if not m:
        raise ValueError("REVu/UNRESTu model needs '[nrate (pairs)...]' "
                         "after the model number")
    nrate = int(m.group(1))
    groups = re.findall(r"\(([^)]*)\)", m.group(2))
    if len(groups) != nrate:
        raise ValueError(f"expected {nrate} '(...)' rate groups, "
                         f"got {len(groups)}")
    code = {"T": 0, "C": 1, "A": 2, "G": 3, "U": 0}
    step = np.zeros((4, 4), dtype=np.int64)
    for i, grp in enumerate(groups):
        chars = [c for c in grp.upper() if c in code]
        if len(chars) % 2:
            raise ValueError(f"odd base count in rate group {i + 1}")
        for k in range(0, len(chars), 2):
            b1, b2 = code[chars[k]], code[chars[k + 1]]
            if b1 == b2:
                raise ValueError("diagonal pair in StepMatrix spec")
            step[b1, b2] = i + 1
            if symmetric:
                step[b2, b1] = i + 1
    return step, nrate
AA_MODEL_BY_INDEX = ["Poisson", "EqualInput", "Empirical", "Empirical_F",
                     "FromCodon0", "FromCodon", "FromCodon", "REVaa_0",
                     "REVaa"]
# reference aa model indices: 0 Poisson 1 EqualInput 2 Empirical 3 Empirical_F
#   5/6 FromCodon variants, 8 REVaa_0, 9 REVaa (src/codeml.c:221-227)


def baseml_spec(opts: dict, ctl_path: str):
    """Build (BasemlSpec, seqfile, treefile, outfile, extras) from ctl."""
    from ..apps.baseml import BasemlSpec

    g = lambda k, d=None: opts.get(k, d)
    model_raw = str(g("model", "0"))
    model_i = int(_first_num(model_raw))
    spec = BasemlSpec(
        model=NUC_MODEL_BY_INDEX[model_i],
        ncatG=int(_first_num(g("ncatG", "5"))),
        fix_alpha=bool(int(_first_num(g("fix_alpha", "1")))),
        alpha=float(_first_num(g("alpha", "0"))),
        # fix_kappa is an int: 2 selects label-defined branch kappa sets
        # under nhomo (reference: GetOptions, src/baseml.c:1046-1053)
        fix_kappa=int(_first_num(g("fix_kappa", "0"))),
        kappa=float(_first_num(g("kappa", "5"))),
        Mgene=int(_first_num(g("Mgene", "0"))),
        Malpha=bool(int(_first_num(g("Malpha", "0")))),
        cleandata=bool(int(_first_num(g("cleandata", "0")))),
        getSE=bool(int(_first_num(g("getSE", "0")))),
        clock=int(_first_num(g("clock", "0"))),
        nhomo=int(_first_num(g("nhomo", "0"))),
        nparK=int(_first_num(g("nparK", "0"))),
        fix_rho=bool(int(_first_num(g("fix_rho", "1")))),
        rho=float(_first_num(g("rho", "0"))),
    )
    if spec.model in ("REVu", "UNRESTu"):
        step, nrate = parse_step_matrix(model_raw,
                                        symmetric=spec.model == "REVu")
        spec.step_matrix = step
        spec.n_user_rates = nrate
    td = str(g("TipDate", "0")).split()
    if td and int(float(td[0])):
        spec.tipdate = True
        spec.tipdate_timeunit = float(td[1]) if len(td) > 1 else None
    if (spec.ncatG > 1 and spec.fix_alpha and spec.alpha == 0
            and not spec.nparK and spec.fix_rho and spec.rho == 0):
        # alpha=0 fixed means no rate variation (reference semantics);
        # nparK models keep ncatG as the number of free rate classes
        spec.ncatG = 1
    extras = {
        "runmode": int(_first_num(g("runmode", "0"))),
        "clock": int(_first_num(g("clock", "0"))),
        "ndata": int(_first_num(g("ndata", "1"))),
        "RateAncestor": int(_first_num(g("RateAncestor", "0"))),
        "method": int(_first_num(g("method", "0"))),
        "nhomo": spec.nhomo,
    }
    return (spec, resolve_path(ctl_path, g("seqfile")),
            resolve_path(ctl_path, g("treefile", "")),
            g("outfile", "mlb"), extras)


def codeml_spec(opts: dict, ctl_path: str):
    from ..apps.codeml import CodemlSpec

    g = lambda k, d=None: opts.get(k, d)
    seqtype = int(_first_num(g("seqtype", "1")))
    aa_model_i = int(_first_num(g("model", "0")))
    spec = CodemlSpec(
        seqtype=seqtype,
        model=int(_first_num(g("model", "0"))) if seqtype == 1 else 0,
        NSsites=int(_first_num(g("NSsites", "0"))),
        codonf=CODON_FREQ_BY_INDEX[int(_first_num(g("CodonFreq", "2")))],
        icode=int(_first_num(g("icode", "0"))),
        ncatG=int(_first_num(g("ncatG", "3"))),
        fix_kappa=bool(int(_first_num(g("fix_kappa", "0")))),
        kappa=float(_first_num(g("kappa", "2"))),
        fix_omega=bool(int(_first_num(g("fix_omega", "0")))),
        omega=float(_first_num(g("omega", ".4"))),
        fix_alpha=bool(int(_first_num(g("fix_alpha", "1")))),
        alpha=float(_first_num(g("alpha", "0"))),
        cleandata=bool(int(_first_num(g("cleandata", "0")))),
        getSE=bool(int(_first_num(g("getSE", "0")))),
        hkyREV=bool(int(_first_num(g("hkyREV", "0")))),
        estFreq=bool(int(_first_num(g("estFreq", "0")))),
        Mgene=int(_first_num(g("Mgene", "0"))),
        clock=int(_first_num(g("clock", "0"))),
        fix_blength=int(_first_num(g("fix_blength", "0"))),
    )
    if seqtype in (2, 3):
        names = {0: "Poisson", 1: "EqualInput", 2: "Empirical",
                 3: "Empirical_F", 5: "FromCodon0", 6: "FromCodon",
                 8: "REVaa_0", 9: "REVaa"}
        spec.aa_model = names.get(aa_model_i, "Empirical_F")
        rf = g("aaRatefile")
        if rf:
            spec.aa_rate_file = resolve_path(ctl_path, rf)
    # NSsites may be a batch list: 'NSsites = 0 1 2 7 8'
    ns_list = [int(t) for t in re.findall(r"\d+", g("NSsites", "0"))]
    extras = {
        "runmode": int(_first_num(g("runmode", "0"))),
        "clock": int(_first_num(g("clock", "0"))),
        "ndata": int(_first_num(g("ndata", "1"))),
        "ndata_mode": _ndata_mode(g("ndata", "1")),
        "NSsites_list": ns_list,
        "RateAncestor": int(_first_num(g("RateAncestor", "0"))),
    }
    return (spec, resolve_path(ctl_path, g("seqfile")),
            resolve_path(ctl_path, g("treefile", "")),
            g("outfile", "mlc"), extras)


def yn00_opts(opts: dict, ctl_path: str):
    g = lambda k, d=None: opts.get(k, d)
    return dict(
        seqfile=resolve_path(ctl_path, g("seqfile")),
        outfile=g("outfile", "yn"),
        icode=int(_first_num(g("icode", "0"))),
        weighting=bool(int(_first_num(g("weighting", "0")))),
        common_f3x4=bool(int(_first_num(g("commonf3x4", "0")))),
    )

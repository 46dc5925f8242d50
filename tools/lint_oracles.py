#!/usr/bin/env python3
"""Boundary-sensitivity linter for the oracle SQL surface.

The green-local/red-driver failures of rounds 6-8 all shared one root
cause: a hashed column produced by round() of a float that can land
EXACTLY on a .5 boundary (an integer/integer quotient, or a value
already rounded at coarser precision re-rounded). DuckDB versions
differ in their rounding at exact halves, and the sandbox pins 1.0.0
while the driver runs newer — so such queries pass locally and fail
the gate. The round-9 convention bans the construct outright: ratios
of integers are emitted via exact half-up integer division
((2a+b)//(2b)); libm transcendentals never reach a hashed column.

This linter enforces the convention on oracle_sql.json so the class
cannot silently reappear. It flags round(X * 1e6), round(X * 1e3),
round(X) where X contains a bare division and none of the
boundary-free operators (a sqrt/exp/ln/pow-derived value is
irrational almost surely, so an EXACT half is measure-zero — those
stay allowed, as do snap-roundings of already-quantized values like
round(jaccard * 1e6) over a 6-decimal-rounded jaccard).

Usage: tools/lint_oracles.py <verify_out_dir>    (reads oracle_sql.json)
Exit 1 when a new violation appears outside the accepted list.
"""
import json
import re
import sys

# transcendental / irrational producers: an exact .5 hit requires the
# value to be rational, so these make the round() a measure-zero risk
SAFE_FNS = re.compile(r"exp\(|ln\(|sqrt\(|pow\(|log\(")

# snap roundings: round(<already 6-decimal value> * 1e6) is within one
# ulp of an integer, so the rounding mode cannot matter
SNAP = re.compile(r"round\((qq\.q|q|jaccard|w\.w\d|[a-z_.]*value|sim|epochs[^)]*)\s*\*\s*1e6\)")

# accepted residual risks, reviewed by hand (see PERF.md round 9):
#   - q261 mean/cv2 over gap moments (large mixed denominators)
#   - q264 quantization error over float data
#   - kmv estimate (denominator ~2^60)
#   - statistical milli-quantities whose denominators are corpus-sized
ACCEPTED = {
    "q261_interarrival",
    "q264_quant_sweep",       # quantization error over float data
    "q303_kmv_error",         # estimate denominator ~2^60
    "q306_hill_tail",         # ln-derived t_sum
    "q318_kruskal_wallis",    # h/hc: denominators N(N+1), corpus-sized
    "q187_threshold_sweep",   # snap of 6-decimal jaccard
    "q329_bbit_minwise",      # snap of 6-decimal jaccard
    # upstream-irrational values the single-expression scan can't see:
    "q234_label_separability",  # moments over float embedding data
    "q238_cluster_ari",       # combinatorial; reduced denominator huge
    "q273_threshold_ari",     # same ARI form
    "q239_isotropy",          # ss from sqrt-normalized cosines
    "q241_pc1_power",         # power-iteration doubles
    "q242_rank_rbo",          # 15-digit literal weights, irrational mix
    "q281_normality_audit",   # s2^2 denominators corpus-sized
    "q289_mix_ess",           # q from pow(share, alpha)
    "q297_alpha_sweep",       # q from pow(share, alpha)
    "q305_neyman_alloc",      # sd via sqrt (correctly-rounded)
    "q320_deseasonalized",    # sigma_r via sqrt
    "q335_scene_cuts",        # cosine via sqrt norms
    "q337_slope_heterogeneity",  # z via sqrt se
}


def find_violations(name: str, sql: str):
    out = []
    for m in re.finditer(r"round\(", sql):
        # take the balanced argument of this round(
        i = m.end()
        depth = 1
        j = i
        while j < len(sql) and depth > 0:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        arg = sql[i:j - 1]
        full = sql[m.start():j]
        # precision-2 money roundings and ", 6)" display roundings of
        # pure +,-,*,/ chains over exact ints are deterministic
        # DOUBLEs, not BIGINT hash keys — the driver compares them as
        # floats with exact equality, which the convention already
        # covers via "identical expression order"; flag only the
        # integer-cast micro/milli quantizations
        if not re.search(r"\*\s*1e[36]", arg) and not re.search(
                r"1e[36]\s*\*", arg):
            continue
        if SAFE_FNS.search(arg):
            continue
        if SNAP.search(full):
            continue
        if "/" not in arg and "//" not in arg:
            # pure product of an integer and a scale — snap or exact
            continue
        out.append(full.replace("\n", " ")[:100])
    return out


def main():
    outdir = sys.argv[1]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        v = find_violations(name, sql)
        if not v:
            continue
        if name in ACCEPTED:
            print(f"{name}: accepted-risk round() retained "
                  f"({len(v)} site(s))")
            continue
        bad += 1
        print(f"{name}: BOUNDARY-SENSITIVE round() in oracle:")
        for x in v:
            print(f"    {x}")
    if bad:
        print(f"== LINT FAILED: {bad} quer{'y' if bad == 1 else 'ies'} ==")
        sys.exit(1)
    print("== LINT OK ==")


if __name__ == "__main__":
    main()

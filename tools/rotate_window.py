"""Propose + apply the per-round PRIORITY_WINDOW rotation.

The driver's CORRECTNESS gate checks the first 50 registry names each
round; the registry holds ~300. Rotating never-attested oracle queries
into the window is the only way they ever get DRIVER-attested (the
local gate already checks all of them at three scales), so each round
swaps long-green veterans out for fresh names — by hand until r12.
This tool automates the policy the hand rotations followed (r12
verdict item 6):

1. ever-attested = union of keys over CORRECTNESS_r*.json (the
   driver's own artifacts — ground truth for "has the driver ever
   checked this name");
2. rotate IN: oracle-backed registry names never attested (explicit
   --include list wins, e.g. when a judge pre-verified specific names;
   remaining slots fill in registration order);
3. rotate OUT: window names attested green in >= --min-green past
   rounds, NEVER a name whose removal would leave one of its tag
   families without a window representative (the pinned-family map
   that every rotation since r10 preserved);
4. pre-verify every IN via tools/compare.py at sf0.01 (exact value
   equality — stricter than the driver's hash) unless --no-verify;
5. rewrite the PRIORITY_WINDOW tuple in registry.py, preserving the
   window size, and print the in/out plan (commit the log with it).

Usage:
  python tools/rotate_window.py                 # propose only (dry run)
  python tools/rotate_window.py --apply         # verify + rewrite
  python tools/rotate_window.py --apply --include dd2_shingle_jaccard ...
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import subprocess
import sys

REPO = "/root/repo"
REGISTRY_PY = f"{REPO}/reduction_dask_spark/registry.py"
SF_VERIFY = "/root/testdata/sf0.01"


def ever_attested() -> dict[str, int]:
    """name -> number of driver rounds it appeared GREEN in: err-free
    AND hash_match is literally True (r13 ADVICE: a null/missing hash
    no longer counts — rows-only driver rows are weaker evidence than
    an oracle hash, so they stay rotation-eligible). A name the driver
    checked and failed would NOT count either — a fixed query gets
    re-attested. In practice every recorded row has carried
    hash_match=true since r1, so this tightening changes no counts
    today; it guards future rows-only window entries."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("err") is None and row.get("hash_match") is True:
                    seen[name] = seen.get(name, 0) + 1
    return seen


def load_registry():
    sys.path.insert(0, REPO)
    from reduction_dask_spark.registry import (
        PRIORITY_WINDOW,
        REGISTRY,
        load_all_operators,
    )

    load_all_operators()
    return list(PRIORITY_WINDOW), REGISTRY


def family_tags(registry, names):
    tags: set[str] = set()
    for n in names:
        tags.update(registry[n].tags)
    return tags


# Array-returning oracle queries: the LOCAL gate (tools/compare.py
# canon) handles array columns, but the DRIVER's own value-hash has
# never seen one — hold such names out of auto-fill until a deliberate
# --include rotation proves the driver side. Currently EMPTY: the two
# r15 candidates left the set late in r15 — mm2's registered output
# was reshaped to 16 scalar f0..f15 columns (prunable AND hashable),
# and mm6 always returned scalars (doc_id, align_z, keep); only its
# INTERMEDIATES are arrays, which no gate ever hashes. The mechanism
# stays for any future array-returning registration.
ARRAY_OUTPUT_HOLDBACK: frozenset[str] = frozenset()


def propose(window, registry, attested, include, n_rotate, min_green, exclude=()):
    # a typo'd --exclude would otherwise silently UN-pin the flagship
    # it was meant to protect (contrast --include, which validates)
    bad_excl = [n for n in exclude if n not in window]
    if bad_excl:
        raise SystemExit(f"--exclude names not in the current window: {bad_excl}")
    oracle_names = [n for n, s in registry.items() if s.oracle is not None]
    never = [
        n
        for n in oracle_names
        if n not in attested
        and n not in window
        # held-back names stay rotation-eligible ONLY by explicit
        # --include (which re-validates against `never` below)
        and (n not in ARRAY_OUTPUT_HOLDBACK or n in include)
    ]

    ins = [n for n in include if n in never]
    bad = [n for n in include if n not in never]
    if bad:
        already = [n for n in bad if n in attested or n in window]
        missing = [n for n in bad if n not in registry or registry[n].oracle is None]
        raise SystemExit(
            f"--include names rejected: already attested/windowed {already}, "
            f"not oracle-backed {missing}"
        )
    for n in never:  # fill remaining slots in registration order
        if len(ins) >= n_rotate:
            break
        if n not in ins:
            ins.append(n)
    ins = ins[:n_rotate]

    # rotate-out candidates: most-attested first (longest green), but
    # never break a tag family's last window representative
    cand = sorted(
        (
            n
            for n in window
            if attested.get(n, 0) >= min_green and n not in set(exclude)
        ),
        key=lambda n: -attested.get(n, 0),
    )
    outs: list[str] = []
    kept = set(window)
    in_tags = family_tags(registry, ins)
    for n in cand:
        if len(outs) >= len(ins):
            break
        remaining = (kept - {n}) | set(ins)
        # every tag this name carries must keep another representative
        if all(
            any(t in registry[m].tags for m in remaining)
            for t in registry[n].tags
        ):
            outs.append(n)
            kept.discard(n)
    if len(outs) < len(ins):
        raise SystemExit(
            f"only {len(outs)} family-safe rotate-outs for {len(ins)} ins "
            f"(lower --n or --min-green)"
        )
    new_window = [n for n in window if n not in set(outs)] + ins
    return ins, outs, new_window, in_tags


def verify(ins) -> None:
    if not ins:  # nothing to verify; compare.py with no filter would run the whole suite
        return
    print(f"pre-verifying {len(ins)} rotate-ins via compare.py at {SF_VERIFY} ...")
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/compare.py", SF_VERIFY, *ins],
        capture_output=True,
        text=True,
    )
    # log EVERY per-name verdict line plus the summary (r14 verdict
    # item: ROTATION_r14.log carried only 1 of 12 PASS lines because
    # this used to tail the last 3 lines of compare.py output)
    lines = r.stdout.strip().splitlines()
    for ln in lines:
        if re.match(r"^(PASS|FAIL|SKIP|\d+ pass)", ln):
            print(ln)
    # anchored match: '290 pass, 0 fail' must not satisfy '0 pass, 0 fail'
    ok = re.search(rf"^{len(ins)} pass, 0 fail", r.stdout, re.MULTILINE)
    if r.returncode != 0 or not ok:
        # a compare.py crash produces zero PASS/FAIL lines — surface
        # the raw tails so the failure is diagnosable from the log
        print(f"compare.py rc={r.returncode}; raw stdout tail:")
        print("\n".join(lines[-5:]))
        if r.stderr.strip():
            print("stderr tail:")
            print("\n".join(r.stderr.strip().splitlines()[-10:]))
        raise SystemExit("pre-verification FAILED — window not rewritten")


def rewrite(new_window) -> None:
    with open(REGISTRY_PY) as f:
        src = f.read()
    body = "\n".join(f'    "{n}",' for n in new_window)
    new_src, n = re.subn(
        r"(PRIORITY_WINDOW: tuple\[str, \.\.\.\] = \(\n)(?:.*?\n)(\))",
        lambda m: m.group(1) + body + "\n" + m.group(2),
        src,
        count=1,
        flags=re.DOTALL,
    )
    if n != 1:
        raise SystemExit("PRIORITY_WINDOW tuple not found in registry.py")
    with open(REGISTRY_PY, "w") as f:
        f.write(new_src)
    print(f"rewrote PRIORITY_WINDOW ({len(new_window)} names) in {REGISTRY_PY}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12, help="how many names to rotate")
    ap.add_argument("--include", nargs="*", default=[],
                    help="force-specific rotate-ins (must be never-attested oracle names)")
    ap.add_argument("--min-green", type=int, default=2,
                    help="min attested rounds before a window name may rotate out")
    ap.add_argument("--exclude", nargs="*", default=[],
                    help="window names PINNED against rotation-out this round "
                         "(r14: flagship compositions a judge asked to keep "
                         "in-window beyond the min-green guard)")
    ap.add_argument("--apply", action="store_true", help="verify + rewrite registry.py")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()

    attested = ever_attested()
    window, registry = load_registry()
    ins, outs, new_window, _ = propose(
        window, registry, attested, args.include, args.n, args.min_green,
        exclude=args.exclude,
    )

    print(f"ever-attested names: {len(attested)} / {len(registry)} registered")
    print(f"rotate IN  ({len(ins)}): {' '.join(ins)}")
    print(f"rotate OUT ({len(outs)}): "
          + " ".join(f"{n}(green x{attested[n]})" for n in outs))
    for n in outs:
        reps = [m for m in new_window
                if m != n and set(registry[n].tags) & set(registry[m].tags)]
        print(f"  family of {n} ({','.join(registry[n].tags)}) keeps: "
              f"{' '.join(reps[:4])}{' ...' if len(reps) > 4 else ''}")

    if not ins:
        print("nothing to rotate — every oracle-backed name is attested")
        return 0
    if not args.apply:
        print("\n(dry run — pass --apply to verify + rewrite)")
        return 0
    if not args.no_verify:
        verify(ins)
    rewrite(new_window)
    return 0


if __name__ == "__main__":
    sys.exit(main())

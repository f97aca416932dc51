#!/usr/bin/env python3
"""Regenerate the certified-state count claims from the newest
CORRECTNESS_r*.json so doc drift cannot recur (the r8 ADVICE class:
hand-synced counts in README/SCALE/verify-SKILL going stale).

Usage:
    python3 scripts/regen_counts.py            # print canonical counts
    python3 scripts/regen_counts.py --check    # exit 1 if any doc
                                               # carries a count that
                                               # disagrees with the
                                               # artifact
    python3 scripts/regen_counts.py --check --allow-ahead
        # mid-round mode: tolerate docs AHEAD of the artifact (queries
        # added since the last driver round); stale counts still fail
    python3 scripts/regen_counts.py --check --tests 330:291:27
        # also validate README's sbt-test claim ("N checks (M ScalaTest
        # tests ...), K suites") against the numbers from the actual
        # run — the r10 ADVICE drift class the query check can't see

The canonical numbers come from one place — the driver's correctness
artifact — and --check greps the three count-bearing docs for
"<n>/<n>" claims that disagree with it. Run after any round that adds
or retires queries, and paste the printed block wherever a count is
quoted.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "SCALE.md", ".claude/skills/verify/SKILL.md"]


def newest_artifact():
    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not arts:
        sys.exit("no CORRECTNESS_r*.json artifact found")
    return arts[-1]


def counts(path):
    data = json.load(open(path))
    n = len(data)
    no_oracle = sorted(k for k, v in data.items()
                       if v.get("err") == "no_oracle")
    with_oracle = n - len(no_oracle)
    green = sorted(k for k, v in data.items() if v.get("hash_match"))
    red = sorted(k for k, v in data.items()
                 if not v.get("hash_match") and v.get("err") != "no_oracle")
    return n, with_oracle, no_oracle, len(green), red


def main():
    art = newest_artifact()
    n, with_oracle, no_oracle, n_green, red = counts(art)
    print(f"artifact:       {os.path.basename(art)}")
    print(f"queries:        {n}")
    print(f"with oracle:    {with_oracle}")
    print(f"oracle green:   {n_green}/{with_oracle}")
    print(f"no_oracle rows: {len(no_oracle)}"
          + (f" ({', '.join(no_oracle)})" if no_oracle else ""))
    if red:
        print(f"RED rows:       {', '.join(red)}")
    if "--check" not in sys.argv:
        return
    # any "<a>/<b> ... hash-match|passed" claim in the docs must quote
    # the canonical green/oracle pair
    stale, ahead = [], []
    pat = re.compile(r"(\d+)/(\d+)(?=[^\n]{0,60}(?:hash-match|passed))")
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        for i, line in enumerate(open(p), 1):
            for m in pat.finditer(line):
                a, b = int(m.group(1)), int(m.group(2))
                if (a, b) == (n_green, with_oracle):
                    continue
                msg = (f"{doc}:{i}: claims {a}/{b}, artifact says "
                       f"{n_green}/{with_oracle}")
                # a claim ABOVE the artifact means queries were added
                # since the last driver round — expected mid-round,
                # resolved when the next CORRECTNESS artifact lands
                (ahead if a >= n_green and b >= with_oracle
                 else stale).append(msg)
    # an AHEAD claim (doc quotes more queries than the artifact) is
    # only legitimate MID-ROUND, after queries were added and before
    # the next driver artifact lands — and even then only behind the
    # explicit flag. By default it fails like a stale count: an
    # inflated or fabricated number must not pass the drift guard this
    # script exists to provide.
    if ahead:
        print("\ndocs AHEAD of the artifact"
              + (" (tolerated: --allow-ahead)"
                 if "--allow-ahead" in sys.argv else "") + ":")
        print("\n".join(ahead))
    if stale:
        print("\nSTALE COUNT CLAIMS:")
        print("\n".join(stale))
        sys.exit(1)
    if ahead and "--allow-ahead" not in sys.argv:
        print("\nAHEAD claims fail without --allow-ahead")
        sys.exit(1)
    # --tests checks:tests:suites — validate the sbt-test count claim
    # (README) against the actual run's numbers; hand-synced test
    # counts drifted twice (r10 ADVICE), and the query check above
    # cannot see them
    if "--tests" in sys.argv:
        want = sys.argv[sys.argv.index("--tests") + 1]
        checks, tests, suites = (int(x) for x in want.split(":"))
        tpat = re.compile(
            r"(\d+) checks \((\d+) ScalaTest tests")
        spat = re.compile(r"(\d+) suites")
        bad = []
        p = os.path.join(REPO, "README.md")
        for i, line in enumerate(open(p), 1):
            m = tpat.search(line)
            if m and (int(m.group(1)), int(m.group(2))) != (checks, tests):
                bad.append(f"README.md:{i}: claims {m.group(1)} checks / "
                           f"{m.group(2)} tests, run says {checks}/{tests}")
            ms = spat.search(line)
            if ms and tpat.search(line) is None and "suites" in line \
                    and "incl." in line and int(ms.group(1)) != suites:
                bad.append(f"README.md:{i}: claims {ms.group(1)} suites, "
                           f"run says {suites}")
        # the suites count rides the line after the checks line — scan
        # a window instead of relying on same-line placement
        text = open(p).read()
        for m in re.finditer(r"checks \(\d+ ScalaTest tests[^.]*?(\d+) suites",
                             text, re.S):
            if int(m.group(1)) != suites:
                bad.append(f"README.md: claims {m.group(1)} suites, "
                           f"run says {suites}")
        if bad:
            print("\nSTALE TEST-COUNT CLAIMS:")
            print("\n".join(bad))
            sys.exit(1)
        print("test-count claims agree with the run")
    if not ahead:
        print("\ndocs agree with the artifact")


if __name__ == "__main__":
    main()

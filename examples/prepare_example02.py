#!/usr/bin/env python3
"""Stand-in corpus preparation for the example-02 recipe.

The reference's second golden test (examples/02train_MLP3_newbob_timit/
prepare_timit/prepare_timit.sh) extracts 23-band FBANK features from TIMIT
with HCopy and builds phone MLFs/lists. TIMIT audio isn't shipped in
either repo, so this stage derives an equivalently-shaped corpus from the
bundled example-01 data: the same 23-dim filterbank features, a 1-state
phone-level reference MLF (collapsing the 135 mono-state tags ``X_sN`` to
45 phones ``X`` with merged intervals, as TIMIT's recipe uses 1-state
phones), a phone list, and randomized train/cv splits — the exact shape
``prepare_timit.sh`` leaves in ``workdir/`` (lists/, mlfs/, dicts/).

Usage: prepare_example02.py <workdir> [--train=80] [--cv=20]
"""

import argparse
import os
import random
import sys

EX01 = "/root/reference/examples/01test_MLP3_compare_multithread_cuda_decode_phn"


def collapse_states_to_phones(lines):
    """``st en X_sN`` intervals → merged ``st en X`` phone intervals."""
    out = []
    cur = None          # [start, end, phone]
    for line in lines:
        parts = line.split()
        if len(parts) < 3:
            continue
        st, en, tag = int(parts[0]), int(parts[1]), parts[2]
        phone = tag.rsplit("_s", 1)[0] if "_s" in tag else tag
        if cur is not None and cur[2] == phone and cur[1] == st:
            cur[1] = en
        else:
            if cur is not None:
                out.append(cur)
            cur = [st, en, phone]
    if cur is not None:
        out.append(cur)
    return [f"{st} {en} {ph}" for st, en, ph in out]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--train", type=int, default=80)
    ap.add_argument("--cv", type=int, default=20)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--example01", default=EX01)
    args = ap.parse_args(argv)

    ex = args.example01
    if not os.path.isdir(ex):
        print(f"example-01 data not found at {ex}", file=sys.stderr)
        return 1
    for sub in ("lists", "mlfs", "dicts"):
        os.makedirs(os.path.join(args.workdir, sub), exist_ok=True)

    # ---- feature lists (randomized split, randomize_list.pl analog) ----
    with open(os.path.join(ex, "lib/test.scp")) as f:
        rels = [l.strip() for l in f if l.strip()]
    paths = [os.path.join(ex, r) for r in rels]
    rng = random.Random(args.seed)
    rng.shuffle(paths)
    n_train = min(args.train, len(paths) - 1)
    n_cv = min(args.cv, len(paths) - n_train)
    with open(os.path.join(args.workdir, "lists/train_fea.scp"), "w") as f:
        f.write("\n".join(paths[:n_train]) + "\n")
    with open(os.path.join(args.workdir, "lists/cv_fea.scp"), "w") as f:
        f.write("\n".join(paths[n_train:n_train + n_cv]) + "\n")

    # ---- phone-level reference MLF (1-state, TIMIT-style) --------------
    phones = []
    with open(os.path.join(ex, "lib/test_3s.mlf")) as f, \
            open(os.path.join(args.workdir, "mlfs/ref.mlf"), "w") as out:
        record = None
        body = []
        for raw in f:
            s = raw.strip()
            if s == "#!MLF!#":
                out.write(s + "\n")
            elif s.startswith('"'):
                record = s
                body = []
            elif s == ".":
                out.write(record + "\n")
                for line in collapse_states_to_phones(body):
                    out.write(line + "\n")
                    ph = line.split()[2]
                    if ph not in phones:
                        phones.append(ph)
                out.write(".\n")
            elif record is not None:
                body.append(s)

    with open(os.path.join(args.workdir, "dicts/phones"), "w") as f:
        f.write("\n".join(sorted(phones)) + "\n")
    print(f"prepared {n_train} train + {n_cv} cv utterances, "
          f"{len(phones)} phones -> {args.workdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

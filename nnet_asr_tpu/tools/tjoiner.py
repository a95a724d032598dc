"""TJoiner — concatenate small HTK feature files into big archives
(TJoiner.cc equivalent).

Joins features in SCP order into large files (an HDD seek optimization in
2012; still useful for network filesystems feeding TPU pods) and emits a
new SCP whose entries address the archives with ``[s,e]`` frame ranges —
the range syntax FeatureRepository understands (Features.cc:1045-1056).
"""

from __future__ import annotations

import os
import sys

from ..io import htk
from ..io.scp import read_scp
from ..utils.config import UserInterface

OPTION_STRING = (
    " -S l   SCRIPT"
    " -T r   TRACE"
    " -D n   PRINTCONFIG=TRUE"
)

SNAME = "TJOINER"


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    ui = UserInterface()
    ui.parse_options(argv, OPTION_STRING, SNAME)

    p_script = ui.get_str("SCRIPT")
    p_outdir = ui.get_str("TARGETPARAMDIR", ".")
    p_outscp = ui.get_str("TARGETSCRIPT")
    max_mb = ui.get_flt("MAXFILESIZE", 512.0)  # per-archive cap in MB
    prefix = ui.get_str("PREFIX", "joined")
    ui.check_command_line_param_use()

    if p_script is None:
        raise SystemExit("Script file must be specified [-S]")
    if p_outscp is None:
        raise SystemExit("Target script must be specified [--TARGETSCRIPT]")
    os.makedirs(p_outdir, exist_ok=True)

    entries = read_scp(p_script)
    out_lines = []
    archive_idx = 0
    cur = None          # (file handle, path, frames_written, dim, kind, period)

    def open_archive(dim, kind, period):
        nonlocal archive_idx
        path = os.path.join(p_outdir, f"{prefix}{archive_idx:04d}.fea")
        archive_idx += 1
        f = open(path, "wb")
        f.write(htk.HtkHeader(0, period, dim * 4, kind).pack(True))
        return [f, path, 0, dim, kind, period]

    def close_archive(cur):
        f, path, n, dim, kind, period = cur
        f.seek(0)
        f.write(htk.HtkHeader(n, period, dim * 4, kind).pack(True))
        f.close()

    max_frames_bytes = max_mb * 1024 * 1024
    for e in entries:
        data, hdr = htk.read_htk_file(e.physical)
        if (cur is None or cur[3] != data.shape[1] or cur[4] != hdr.sample_kind
                or cur[2] * cur[3] * 4 + data.nbytes > max_frames_bytes):
            if cur is not None:
                close_archive(cur)
            cur = open_archive(data.shape[1], hdr.sample_kind,
                               hdr.sample_period)
        start = cur[2]
        cur[0].write(data.astype(">f4").tobytes())
        cur[2] += data.shape[0]
        out_lines.append(
            f"{e.logical}={cur[1]}[{start},{cur[2] - 1}]")
    if cur is not None:
        close_archive(cur)

    with open(p_outscp, "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"TJoiner: {len(entries)} files -> {archive_idx} archives")
    return 0


def _cli():
    """Reference-style top-level error handling (TNet.cc:371-376)."""
    import sys
    try:
        sys.exit(main())
    except SystemExit:
        raise
    except Exception as e:
        print("Exception thrown", file=sys.stderr)
        print(e, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    _cli()

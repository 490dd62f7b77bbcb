#!/usr/bin/env python3
"""Split a graft.Explain dump into per-query plan files.

Usage: split_plans.py <explain_dump> <outdir> <suffix> [q1,q2,...]

Writes <outdir>/<query>_<suffix>.txt for each selected query (all queries
if no filter given). The dump format is `==== <name> ====` section headers
as emitted by graft.Explain.
"""
import sys, os, re

def main():
    dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(outdir, exist_ok=True)
    name, buf, n = None, [], 0
    def flush():
        nonlocal n
        if name and (only is None or name in only):
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write("".join(buf))
            n += 1
    with open(dump) as f:
        for line in f:
            m = re.match(r"^==== (\S+) ====$", line.strip())
            if m:
                flush()
                name, buf = m.group(1), []
            else:
                buf.append(line)
    flush()
    print(f"wrote {n} plan files to {outdir}")

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Extract a delimited-text column to a binary file (analog of
``benchmarks/text_to_binary.py``: int/long/float/double/string-UTF16 columns
for dataset preparation, reference ``:49-76``)."""
import argparse
import sys

import numpy as np

DTYPES = {
    "int": np.int32, "long": np.int64, "float": np.float32,
    "double": np.float64, "string": None,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("column_type", choices=sorted(DTYPES))
    ap.add_argument("column_index", type=int)
    ap.add_argument("output")
    ap.add_argument("--delimiter", default=",")
    args = ap.parse_args()

    values = []
    with open(args.input, "r", errors="replace") as f:
        for line in f:
            parts = line.rstrip("\n").split(args.delimiter)
            if args.column_index < len(parts):
                values.append(parts[args.column_index])

    if args.column_type == "string":
        # reference writes UTF-16 string columns
        with open(args.output, "wb") as f:
            for v in values:
                f.write(v.encode("utf-16-le"))
    else:
        dt = DTYPES[args.column_type]
        arr = np.array([_parse(v, dt) for v in values], dtype=dt)
        arr.tofile(args.output)
    print(f"wrote {len(values)} values to {args.output}", file=sys.stderr)


def _parse(v, dt):
    try:
        return dt(float(v)) if np.issubdtype(dt, np.floating) else dt(int(float(v or 0)))
    except (ValueError, OverflowError):
        return dt(0)


if __name__ == "__main__":
    main()

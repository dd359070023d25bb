#!/usr/bin/env python3
"""Resume tools/check.py from a given query name (inclusive, sorted order).
Usage: python3 tools/check_resume.py <sfDir> <outDir> <fromName>

Works by temporarily swapping outDir/oracle_sql.json for the suffix
subset and restoring it afterwards. Caveat: a SIGKILL between the swap
and the restore leaves the truncated subset in place — restore from
the .bak file by hand if that happens.
"""
import sys, os, json
sys.path.insert(0, os.path.dirname(__file__))
import check


def main(sf_dir, out_dir, from_name):
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    full = json.load(open(oracle_path))
    subset = {k: v for k, v in sorted(full.items()) if k >= from_name}
    backup = oracle_path + ".bak"
    os.replace(oracle_path, backup)
    json.dump(subset, open(oracle_path, "w"))
    try:
        return check.main(sf_dir, out_dir)
    finally:
        os.replace(backup, oracle_path)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))

#!/usr/bin/env python3
"""Resume tools/check.py from a given query name (inclusive, sorted order).
Usage: python3 tools/check_resume.py <sfDir> <outDir> <fromName>"""
import sys, os, json
sys.path.insert(0, os.path.dirname(__file__))
import check

def main(sf_dir, out_dir, from_name):
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    full = json.load(open(oracle_path))
    subset = {k: v for k, v in sorted(full.items()) if k >= from_name}
    tmp = oracle_path + ".resume"
    # check.main reads oracle_sql.json from out_dir; point it at a temp outdir view
    # simpler: monkeypatch json.load is fragile — instead temporarily swap file
    backup = oracle_path + ".bak"
    os.replace(oracle_path, backup)
    json.dump(subset, open(oracle_path, "w"))
    try:
        return check.main(sf_dir, out_dir)
    finally:
        os.replace(backup, oracle_path)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))

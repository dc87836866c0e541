#!/usr/bin/env python3
"""Oracle sweep one scale up (sf1): the driver's DuckDB compare run over a
GenScale tile, per-query in a SUBPROCESS with a wall-clock timeout — the
heavy md5-minhash/shingle oracles are 10x their sf0.1 cost in DuckDB and a
hung one must not stall the sweep. Timeouts are recorded distinctly
("timeout", not failure): they are an oracle-COST statement, not a
correctness one. Writes a CORRECTNESS_sf1-style JSON artifact.

Usage: verify_sweep.py <sfdir> <outdir> <artifact.json> [timeout_sec]
(after `sbt "runMain graft.Verify <sfdir> <outdir> <regex>"`)
"""
import json, os, subprocess, sys, time

def main(sfdir, outdir, artifact, timeout, only=None):
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results, order = {}, sorted(oracles)
    if only:
        order = [n for n in order if n in only]
        if os.path.exists(artifact):  # merge mode: keep prior results
            results = json.load(open(artifact))["results"]
    t_all = time.time()
    for name in order:
        t0 = time.time()
        # one subprocess per oracle: DuckDB can't be interrupted in-process
        code = (
            "import sys, json\n"
            "sys.path.insert(0, 'tools')\n"
            # pandas maps its .so lazily; a huge DuckDB result can exhaust
            # address space first and the import then fails mid-compare —
            # map it BEFORE the query runs
            "import pandas\n"
            "import duckdb, verify_local\n"
            "con = duckdb.connect()\n"
            # slow queries emit a progress bar to stdout and corrupt the
            # JSON line — disable it, and belt-and-braces rindex the JSON
            "con.execute('PRAGMA disable_progress_bar')\n"
            f"sfdir, outdir, name = {sfdir!r}, {outdir!r}, {name!r}\n"
            "import os\n"
            "for t in verify_local.TABLES:\n"
            "    if os.path.exists(f'{sfdir}/{t}.parquet'):\n"
            "        con.execute(f\"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'\")\n"
            "sql = json.load(open(f'{outdir}/oracle_sql.json'))[name]\n"
            "ok, detail = verify_local.compare(con, sql, f'{outdir}/{name}')\n"
            "print(json.dumps({'ok': ok, 'detail': detail}))\n")
        try:
            r = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                               capture_output=True, text=True, timeout=timeout)
            out = r.stdout
            line = out[out.rindex('{"ok"'):] if '{"ok"' in out else ""
            try:
                d = json.loads(line)
                status = "pass" if d["ok"] else "fail"
                detail = d["detail"]
                # a DuckDB allocation failure is the oracle-RESOURCE class
                # (like a timeout): a statement about the oracle's cost at
                # this scale, not about engine agreement
                if status == "fail" and "Out of Memory" in (detail or ""):
                    status = "oom"
            except Exception:
                status, detail = "fail", (r.stderr.strip()[-400:] or "no output")
        except subprocess.TimeoutExpired:
            status, detail = "timeout", f"oracle exceeded {timeout}s in DuckDB"
        results[name] = {"status": status, "detail": detail,
                         "sec": round(time.time() - t0, 1)}
        print(f"{status.upper():7s} {name}  {results[name]['sec']}s"
              + (f"  {detail}" if detail else ""), flush=True)
    n = {s: sum(1 for v in results.values() if v["status"] == s)
         for s in ("pass", "fail", "timeout", "oom", "regime")}
    tolerant = [k for k, v in results.items() if "tolerant" in (v["detail"] or "")]
    out = {"sfdir": sfdir, "timeout_sec": timeout, "total_sec": round(time.time() - t_all, 1),
           "n_pass": n["pass"], "n_fail": n["fail"], "n_timeout": n["timeout"],
           "n_oom": n["oom"], "n_regime": n["regime"],
           "tolerant_only": tolerant, "results": results}
    json.dump(out, open(artifact, "w"), indent=1)
    print(f"\n{n['pass']} pass, {n['fail']} fail, {n['timeout']} timeout, "
          f"{n['oom']} oom, {n['regime']} regime -> {artifact}")
    return 1 if n["fail"] else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 600,
                  set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None))

"""Top-up an existing CORRECTNESS_LOCAL archive with named queries.

The full-registry decade sweeps (sf0.1 / sf1) take tens of minutes;
when a batch of new operators lands, re-running 280+ queries to
archive 5 new rows delays the land-to-archive discipline VERDICT r8
asked for.  This runs ONLY the named queries at the given SF dir and
merges their rows into the archive JSON, so the archive tracks HEAD
the same commit an operator lands.

Usage: python tools/sweep_topup.py ARCHIVE.json SF_DIR name [name...]
"""
import sys, json, os

sys.path.insert(0, "/root/repo")

ARCHIVE, SF = sys.argv[1], sys.argv[2]
NAMES = sys.argv[3:]

# reuse driver_sim's compare by running it with a name filter
os.environ["SPARK_GRAFT_SIM_SF"] = SF
os.environ["SPARK_GRAFT_SIM_ONLY"] = ",".join(NAMES)
os.environ.setdefault("SPARK_GRAFT_SIM_DRIVER_MEM", "16g")
out_tmp = ARCHIVE + ".topup"
sys.argv = ["driver_sim.py", out_tmp]
try:
    exec(open("/root/repo/tools/driver_sim.py").read())
except SystemExit as ex:
    if ex.code:
        raise

base = json.load(open(ARCHIVE)) if os.path.exists(ARCHIVE) else {}
base.update(json.load(open(out_tmp)))
json.dump(base, open(ARCHIVE, "w"), indent=2, sort_keys=True)
os.remove(out_tmp)
print(f"merged {len(NAMES)} rows into {ARCHIVE}: now {len(base)} rows")

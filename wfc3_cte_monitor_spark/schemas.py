"""Schemas for the four domain tables (SURVEY.md §1.3).

The reference declares its schemas in text spec files parsed at import
time (wfc3_cte_monitor/database_interface.py:173-214 over
table_definitions/*.txt, six recognized types). We keep the same
spec-driven idea — a schema is a list of ``name:type`` strings compiled to
a StructType — with the reference's type quirks normalized at the
boundary (SURVEY §1.2): ``flashlvl`` → int (stored as a zero-padded
string into a Float column in the reference), ``ctecorr`` → int 0/1,
``dateobs`` → int MJD day.
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPE_MAP = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
}

# Aperture radii (px): wfc3_cte_monitor/database_update.py:440 /
# table_definitions/phot.txt:8-49.
APERTURES = [2, 3, 5, 7, 10, 12, 15, 18, 20, 24, 28, 32, 36, 40]

# Flux-bin labels: wfc3_cte_monitor/config.py:14-16 (overlapping).
FLUXBIN_LABELS = [
    "250_500", "500_1000", "500_2000", "1000_2000",
    "2000_4000", "2000_8000", "4000_8000", "8000_32000",
]


def compile_schema(spec: list[str]) -> T.StructType:
    """Compile ``name:type`` spec lines (the table_definitions idea) into a
    StructType."""
    fields = []
    for line in spec:
        name, _, typ = line.partition(":")
        fields.append(T.StructField(name.strip(), _TYPE_MAP[typ.strip()], True))
    return T.StructType(fields)


# master: table_definitions/master.txt:1-5
MASTER_SPEC = ["targname:string", "master_id:int", "xpix:float", "ypix:float",
               "ra:float", "dec:float"]

# fileinfo: table_definitions/fileinfo.txt:1-29 (mode keys + bookkeeping)
FILEINFO_SPEC = [
    "targname:string", "imagename:string", "imagepath:string",
    "ingest_date:date", "mnclip_bkgrd:float",
    "proposid:string", "dateobs:int", "filter:string", "exptime:float",
    "chinject:string", "flashlvl:int", "ctecorr:int", "chip:int",
    "flashdur:float", "flashcur:string", "shutrpos:string",
    "postarg1:float", "postarg2:float",
    "ra_lowerleft:float", "dec_lowerleft:float",
    "ra_lowerright:float", "dec_lowerright:float",
    "ra_upperright:float", "dec_upperright:float",
    "ra_upperleft:float", "dec_upperleft:float",
]

# phot (wide by aperture): table_definitions/phot.txt:1-49
PHOT_SPEC = (
    ["targname:string", "master_id:int", "find_id:int", "imagename:string",
     "ingest_date:date", "xpix:float", "ypix:float", "ra:float", "dec:float"]
    + [f"flux_{r}:float" for r in APERTURES]
    + [f"mnbkgrd_{r}:float" for r in APERTURES]
    + [f"totbkgrd_{r}:float" for r in APERTURES]
)

# results (wide by flux bin): table_definitions/results.txt:1-29
RESULTS_SPEC = (
    ["targname:string", "imagename_1:string", "imagename_2:string",
     "slopefile:string", "slopefile_path:string", "aperture:float"]
    + [f"slope_{b}:float" for b in FLUXBIN_LABELS]
    + [f"slopestdev_{b}:float" for b in FLUXBIN_LABELS]
    + [f"numpoints_{b}:int" for b in FLUXBIN_LABELS]
)

MASTER_SCHEMA = compile_schema(MASTER_SPEC)
FILEINFO_SCHEMA = compile_schema(FILEINFO_SPEC)
PHOT_SCHEMA = compile_schema(PHOT_SPEC)
RESULTS_SCHEMA = compile_schema(RESULTS_SPEC)

# The 8 mode keys of the pair contract (database_queries.py:589-678).
PAIR_MODE_KEYS = [
    "proposid", "dateobs", "filter", "exptime",
    "chinject", "flashlvl", "ctecorr", "postarg1",
]

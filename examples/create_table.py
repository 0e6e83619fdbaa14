"""Port of the reference's examples/create_table.py to this engine.

The original (reference examples/create_table.py:8-22) reads two
parquet tables over a CCS connection, builds a cross-table positional
expression, multiplies by a float scalar, filters, and prints.
Identical program here — only the import changes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import charmpandas_spark.compat as cpd  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    cpd.activate(cpd.LocalCluster(4))

    df1 = cpd.read_parquet(os.path.join(SF, "supplier.parquet"))
    df2 = cpd.read_parquet(os.path.join(SF, "supplier.parquet"))

    # cross-table positional arithmetic (reference create_table.py:17-18)
    df1["test"] = df1["s_acctbal"] + 2 * df2["s_acctbal"]
    df1["test"] = 2.0 * df1["test"]

    # filter on the derived column (create_table.py:21-22)
    big = df1[df1["test"] > 100.0]
    big.print(5)
    print(f"{big.count()} suppliers with test > 100")


if __name__ == "__main__":
    main()

"""Scalar transform library (pure Python + Spark column helpers).

Byte-parity layer: these functions reproduce the cleaning semantics of
the reference's input/output processors (hepcrawl/inputs.py,
hepcrawl/outputs.py, hepcrawl/utils.py, hepcrawl/dateutils.py) so that
extracted field values are byte-identical to the reference pytest
goldens.  They run inside Arrow-batched UDFs (mapInPandas) — never as
row-at-a-time Python UDFs.
"""

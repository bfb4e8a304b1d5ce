"""Batch medallion ETL: bronze envelope -> silver cleaned -> gold star schema.

Pure DataFrame -> DataFrame functions (no I/O inside transforms): testable
against fixtures, composable into jobs, and identical whether the input is a
batch bronze scan or a streaming micro-batch.
"""

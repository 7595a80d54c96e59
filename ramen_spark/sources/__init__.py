"""Batch sources & sinks mirroring the reference's ReadExternal
operation and archivist (SURVEY §2.1, §3.3):

- ``csv``     : the RaQL CSV option surface on Spark's reader.
- ``archive`` : Parquet archival with PERSIST-FOR retention, replay
                (time-sliced re-execution) and factor-partitioning.
"""

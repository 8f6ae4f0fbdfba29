from geomesa_nifi_ray.pipelines.queries import QUERIES, ORACLE_SQL, get_binlog, run_cdc_replay

__all__ = ["QUERIES", "ORACLE_SQL", "get_binlog", "run_cdc_replay"]

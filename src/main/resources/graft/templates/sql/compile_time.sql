-- Engine + session info (analog of the reference's compile_time.sql)
SELECT version() AS spark_version,
       current_timestamp() AS compiled_at,
       '${version}' AS graft_version;

package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType

/** Forwarding shim: [[PartitioningUtils.parsePartitions]] is
  * package-private to `datasources`, but it IS the engine's multi-basePath
  * partition discovery (types, null-partition handling, escaping) and
  * graft's manifest file index must produce byte-identical partition
  * columns to a plain directory read. Re-exposing the one method here —
  * the established pattern for Spark-integrated table formats — beats
  * re-implementing partition-value type inference and drifting from it.
  */
object GraftPartitionParsing {
  def parsePartitions(
      paths: Seq[Path],
      typeInference: Boolean,
      basePaths: Set[Path],
      userSpecifiedSchema: Option[StructType],
      caseSensitive: Boolean,
      validatePartitionColumns: Boolean,
      timeZoneId: String,
      ignoreInvalidPartitionPaths: Boolean): PartitionSpec =
    PartitioningUtils.parsePartitions(paths, typeInference, basePaths,
      userSpecifiedSchema, caseSensitive, validatePartitionColumns,
      timeZoneId, ignoreInvalidPartitionPaths)
}

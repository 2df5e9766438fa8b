package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Zone-stats writeback (WorkflowGeoIndicators.groovy:1670-1712
 * `computeZoneStats`): appends run reporting onto the zone table —
 * NB_BUILDING (buildings WITH an RSU relation, the reference's
 * `ID_RSU IS NOT NULL` filter), NB_ESTIMATED_BUILDING, NB_BLOCK, NB_RSU,
 * COMPUTATION_TIME (seconds), LAST_UPDATE, VERSION, BUILD_NUMBER.
 *
 * Wall-clock and timestamps are PARAMETERS (the caller owns them) so the
 * transform itself stays deterministic and oracle-able; the reference
 * hard-reads System.currentTimeMillis/now() inline. Counts are three tiny
 * aggregates cross-joined onto the (one-row-per-zone) table — no per-zone
 * correlated subqueries.
 */
object ZoneStats {

  def computeZoneStats(zone: DataFrame,
                       buildingIndicators: Option[DataFrame],
                       blockIndicators: Option[DataFrame],
                       rsuIndicators: Option[DataFrame],
                       nbEstimatedBuilding: Long,
                       computationTimeSec: Long,
                       lastUpdate: String, version: String, buildNumber: String): DataFrame = {
    def one(dfOpt: Option[DataFrame], filter: DataFrame => DataFrame, name: String): DataFrame =
      dfOpt.map(df => filter(df).agg(count(lit(1)).cast("int").as(name)))
        .getOrElse(zone.sparkSession.range(1).select(lit(0).as(name)))
    val nb = one(buildingIndicators, _.where(col("id_rsu").isNotNull), "nb_building")
    val nblk = one(blockIndicators, identity, "nb_block")
    val nrsu = one(rsuIndicators, identity, "nb_rsu")
    zone
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nblk)).crossJoin(broadcast(nrsu))
      .withColumn("nb_estimated_building", lit(nbEstimatedBuilding).cast("int"))
      .withColumn("computation_time", lit(computationTimeSec).cast("int"))
      .withColumn("last_update", lit(lastUpdate))
      .withColumn("version", lit(version))
      .withColumn("build_number", lit(buildNumber))
  }
}

package graft.kb

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The 12-fact metric-semantics KB, ported from the reference's own unit
 * test (kb/src/test/java/amie/data/B_KBTest.java:16-27) — the fixture on
 * which support / head coverage / std+PCA confidence are asserted against
 * hand-computed values (FIXTURES.md §1).
 */
object Fixtures {
  val baseFacts: Seq[Triple] = Seq(
    Triple("Luis", "wasBornIn", "Guayaquil"),
    Triple("Thomas", "wasBornIn", "Munich"),
    Triple("Antoine", "wasBornIn", "Colmar"),
    Triple("Oana", "livesIn", "Paris"),
    Triple("Luis", "livesIn", "Paris"),
    Triple("Thomas", "livesIn", "Paris"),
    Triple("Antoine", "livesIn", "Paris"),
    Triple("Ambar", "worksAt", "ESPOL"),
    Triple("Luis", "worksAt", "Telecom"),
    Triple("Thomas", "worksAt", "Telecom"),
    Triple("Antoine", "worksAt", "Telecom"),
    Triple("Telecom", "isLocatedIn", "Paris"))

  /** Extended variant (+5 facts, B_KBTest.java:93-97). */
  val extendedFacts: Seq[Triple] = baseFacts ++ Seq(
    Triple("Jonathan", "livesIn", "Villejuif"),
    Triple("Jonathan", "worksAt", "Telecom"),
    Triple("Villejuif", "isLocatedIn", "France"),
    Triple("Luis", "worksAt", "INRIA"),
    Triple("INRIA", "isLocatedIn", "Paris"))

  def baseKB(spark: SparkSession): DataFrame = {
    import spark.implicits._
    baseFacts.toDF()
  }

  def extendedKB(spark: SparkSession): DataFrame = {
    import spark.implicits._
    extendedFacts.toDF()
  }
}

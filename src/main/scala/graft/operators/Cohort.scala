package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the acquisition-quality view: users grouped by
  * WHEN they arrived (their cohort period), tracked by whether they
  * remained active N periods later. The triangle this emits
  * (cohort × offset) is the standard growth-accounting artifact; q83's
  * funnel answers "did a user convert once", retention answers "did
  * the users we acquired in week W still show up in week W+N".
  */
object Cohort {

  /** Retention matrix. A user's cohort is the calendar period (fixed
    * `periodDays` grid from the epoch — exact integer micros div, no
    * calendar arithmetic) of their FIRST `cohortEvent`; any event at or
    * after that moment marks them active in its period. Periods before
    * the cohort event (a click before signup) are ignored.
    *
    * Scale shape: one aggregate to the per-user cohort table, one
    * corpus×user equi-join (co-partitioned on the user key), one
    * distinct (cohort, offset, user) aggregate — map-side collapse for
    * hot users — then the bounded (cohorts × offsets) matrix; cohort
    * sizes come from the offset-0 row (the cohort event itself is
    * activity), so no second corpus pass. Exact integers throughout.
    *
    * Output: (cohort_period, period_offset, n_active, cohort_size,
    * retention_ppm), cohort_period = epoch-micros div period.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, cohortEvent: String,
                periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, s"periodDays must be positive, got $periodDays")
    val periodMicros = periodDays.toLong * 86400L * 1000000L
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        col(tsCol).cast("timestamp").as("__t"), col(typeCol).as("__ty"))
    val cohorts = base.filter(col("__ty") === cohortEvent)
      .groupBy(col("__u")).agg(min(col("__t")).as("__c0"))
      .select(col("__u"),
        expr(s"unix_micros(__c0) div ${periodMicros}L").as("__cp"),
        col("__c0"))
    val active = base.join(cohorts, "__u")
      .filter(col("__t") >= col("__c0"))
      .select(col("__u"), col("__cp"),
        (expr(s"unix_micros(__t) div ${periodMicros}L") - col("__cp"))
          .as("__off"))
      .distinct()
    val matrix = active.groupBy(col("__cp"), col("__off"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = matrix.filter(col("__off") === 0L)
      .select(col("__cp"), col("n_active").as("cohort_size"))
    matrix.join(sizes, "__cp")
      .select(col("__cp").as("cohort_period"),
        col("__off").as("period_offset"), col("n_active"),
        col("cohort_size"),
        expr("(n_active * 1000000) div cohort_size").as("retention_ppm"))
  }
}

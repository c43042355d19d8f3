package graft.functions

import org.apache.spark.sql.SparkSession

/** ML-scoring UDF stub (SURVEY §2.11): the reference registers an MLflow
  * pyfunc model as `predict_churn` and calls it over a struct of features
  * (`C360/01.1:297-305`). No model runtime ships here, so the stub is a
  * deterministic rule with the same call shape — swap the body for a real
  * model scorer without touching callers.
  */
object ModelUdf {

  /** Register `predict_churn(days_since_last_order, n_orders) -> int`. */
  def registerChurnStub(spark: SparkSession): Unit =
    spark.udf.register("predict_churn",
      (daysSinceLastOrder: Int, nOrders: Long) =>
        if (daysSinceLastOrder > 1500 || nOrders < 3) 1 else 0)
}

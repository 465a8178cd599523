package graft.sources.dwrf

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** Per-task scan counters (reference M5 profiler counters, re-expressed as
  * DataSource V2 CustomMetrics so they surface in the Spark UI): how many
  * stripes/strides the stats-based skipping actually eliminated, and how
  * many bytes hit the wire.
  */
final class ScanCounters extends Serializable {
  var stripesRead = 0L
  var stripesSkipped = 0L
  var stridesSkipped = 0L
  var bytesRead = 0L
  var batchesEmitted = 0L
  var preads = 0L
}

object DwrfMetrics {
  final class StripesRead extends CustomSumMetric {
    override def name(): String = "stripesRead"
    override def description(): String = "dwrf stripes read"
  }
  final class StripesSkipped extends CustomSumMetric {
    override def name(): String = "stripesSkipped"
    override def description(): String = "dwrf stripes skipped by stats"
  }
  final class StridesSkipped extends CustomSumMetric {
    override def name(): String = "stridesSkipped"
    override def description(): String = "dwrf row-index strides skipped by stats"
  }
  final class BytesRead extends CustomSumMetric {
    override def name(): String = "bytesRead"
    override def description(): String = "dwrf bytes read"
  }
  final class BatchesEmitted extends CustomSumMetric {
    override def name(): String = "batchesEmitted"
    override def description(): String = "dwrf columnar batches emitted"
  }
  final class Preads extends CustomSumMetric {
    override def name(): String = "preads"
    override def description(): String = "dwrf positioned reads issued"
  }

  val all: Array[CustomMetric] = Array(
    new StripesRead, new StripesSkipped, new StridesSkipped, new BytesRead,
    new BatchesEmitted, new Preads)

  def task(metricName: String, v: Long): CustomTaskMetric = new CustomTaskMetric {
    // NB: the parameter must not be called `name` — inside the anonymous
    // class it would resolve to this very method (shadowing), and scalac
    // compiles the self tail-call into an infinite loop
    override def name(): String = metricName
    override def value(): Long = v
  }

  def taskValues(c: ScanCounters): Array[CustomTaskMetric] = Array(
    task("stripesRead", c.stripesRead),
    task("stripesSkipped", c.stripesSkipped),
    task("stridesSkipped", c.stridesSkipped),
    task("bytesRead", c.bytesRead),
    task("batchesEmitted", c.batchesEmitted),
    task("preads", c.preads))
}

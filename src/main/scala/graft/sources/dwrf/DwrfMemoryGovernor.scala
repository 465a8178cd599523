package graft.sources.dwrf

import java.util.concurrent.atomic.AtomicInteger

/** Cross-writer memory governance (reference A3/A4's MemoryManager,
  * `MemoryManager.java:148-306`, re-expressed for Spark's task model):
  * all concurrent [[DwrfFileWriter]]s in this executor JVM share one
  * memory pool, and each writer's effective stripe budget is its
  * requested stripe size scaled by pool availability —
  *
  *   budget = stripeSize × scale × multiplier,
  *   scale  = min(1, pool / Σ requested)
  *
  * so a task writing 64 dynamic partitions at once flushes smaller
  * stripes instead of buffering 64 × 256 MB and dying. Two further
  * reference behaviors carried over:
  *
  *  - **rich→needy rebalance** (`MemoryManager.java:252-306`): every
  *    [[RowsBetweenChecks]] pooled rows, writers that flushed ≥ 2 times
  *    since the last check (needy — their budget is too small for their
  *    row width) take allocation from writers that flushed 0 times
  *    (rich — halve their multiplier, floored so no writer drops below
  *    [[MinBudgetBytes]]);
  *  - **low-memory mode** (`MemoryManager.java:169-178` +
  *    `WriterImpl.enterLowMemoryMode`): when the pool is oversubscribed
  *    past [[LowMemoryScale]], in-flight writers abandon their string
  *    dictionaries (the standing memory hog) and zlib compression
  *    escalates to level ≥ 6 (smaller buffered blocks) — applied via
  *    [[DwrfWritePressure]]. Hysteresis: the mode lifts only when the
  *    scale recovers past 2 × LowMemoryScale.
  *
  * The pool defaults to half the JVM max heap (the reference's
  * `hive.exec.orc.memory.pool = 0.5`). All state is per-JVM by design:
  * on a real cluster each executor governs its own writers, which is
  * exactly the granularity the reference's per-process MemoryManager
  * had inside a Hive task.
  */
object DwrfMemoryGovernor {

  final class Reg private[DwrfMemoryGovernor] (val requested: Long) {
    @volatile private[DwrfMemoryGovernor] var multiplier: Double = 1.0
    private[DwrfMemoryGovernor] val flushes = new AtomicInteger(0)
    private[dwrf] def currentMultiplier: Double = multiplier
  }

  val RowsBetweenChecks = 5000L
  val MinBudgetBytes: Long = 4L * 1024 * 1024
  val LowMemoryScale = 0.25
  val PoolFraction = 0.5

  // test hook: deterministic pool size regardless of the JVM running it
  @volatile private[dwrf] var poolBytesOverride: Long = -1L

  def poolBytes: Long =
    if (poolBytesOverride > 0) poolBytesOverride
    else (Runtime.getRuntime.maxMemory() * PoolFraction).toLong

  private val regs = new java.util.HashSet[Reg]()
  private var totalRequested = 0L
  @volatile private var _scale = 1.0
  @volatile private var _lowMemory = false
  private var pooledRows = 0L

  def scale: Double = _scale
  def lowMemory: Boolean = _lowMemory
  private[dwrf] def activeWriters: Int = regs.synchronized { regs.size }

  private def updateScale(): Unit = {
    _scale =
      if (totalRequested <= 0) 1.0
      else math.min(1.0, poolBytes.toDouble / totalRequested)
    if (!_lowMemory && _scale < LowMemoryScale) _lowMemory = true
    else if (_lowMemory && _scale >= 2 * LowMemoryScale) _lowMemory = false
  }

  def register(requestedStripeSize: Long): Reg = regs.synchronized {
    val r = new Reg(math.max(1L, requestedStripeSize))
    regs.add(r)
    totalRequested += r.requested
    updateScale()
    r
  }

  def unregister(r: Reg): Unit = regs.synchronized {
    if (regs.remove(r)) {
      totalRequested -= r.requested
      updateScale()
    }
  }

  /** The writer's current effective stripe budget in bytes. The floor is
    * min(requested, [[MinBudgetBytes]]): scaling never pushes a writer
    * below 4 MB, but a DELIBERATELY tiny configured stripe size (tests,
    * golden files) is honored exactly — the governor only ever shrinks
    * budgets, never grows them past the request.
    */
  def budgetFor(r: Reg): Long = {
    val floor = math.min(r.requested, MinBudgetBytes)
    val scaled = (r.requested * _scale * r.multiplier).toLong
    math.max(floor, math.min(r.requested, scaled))
  }

  /** A budget-triggered stripe flush happened on `r`. */
  def noteFlush(r: Reg): Unit = { r.flushes.incrementAndGet(); () }

  /** Row-count heartbeat (writers call this from their batched memory
    * check, so the cost is one synchronized add per 1024 rows). Every
    * [[RowsBetweenChecks]] pooled rows, rebalance rich→needy.
    */
  def addedRows(n: Long): Unit = regs.synchronized {
    pooledRows += n
    if (pooledRows < RowsBetweenChecks) return
    pooledRows = 0
    if (!_lowMemory || regs.size < 2) {
      // pressure lifted (or nothing to rebalance): decay halved
      // multipliers back toward 1.0, one doubling per check — a writer
      // that was briefly idle during one low-memory check must not keep
      // an undersized stripe budget for the rest of its file (the
      // reference MemoryManager re-grows allocations the same way a
      // fresh notifyWriters pass recomputes them)
      regs.forEach { r =>
        if (r.multiplier < 1.0) r.multiplier = math.min(1.0, r.multiplier * 2)
        r.flushes.set(0)
      }
      return
    }
    val needy = new java.util.ArrayList[Reg]()
    val rich = new java.util.ArrayList[Reg]()
    regs.forEach { r =>
      if (r.flushes.get() >= 2) needy.add(r)
      else if (r.flushes.get() == 0) rich.add(r)
      r.flushes.set(0)
    }
    if (!needy.isEmpty && !rich.isEmpty) {
      var freed = 0.0
      rich.forEach { r =>
        val halved = r.requested * _scale * (r.multiplier / 2)
        if (halved >= MinBudgetBytes) { // never starve a rich writer dry
          freed += halved
          r.multiplier /= 2
        }
      }
      if (freed > 0) {
        val share = freed / needy.size()
        needy.forEach { r =>
          // (requested·scale·mult) + share = requested·scale·mult'
          r.multiplier += share / (r.requested * _scale)
        }
      }
    }
  }

  /** Test hook: drop all registrations (a leaked Reg from an aborted test
    * must not depress every later writer's budget). */
  private[dwrf] def resetForTest(): Unit = regs.synchronized {
    regs.clear(); totalRequested = 0; pooledRows = 0
    _lowMemory = false
    updateScale()
  }
}

/** Per-writer mutable pressure flags, consulted by the encode/compress
  * hot paths (reference `WriterImpl.enterLowMemoryMode`: abandon
  * dictionaries, raise zlib to ≥ 6). Lives OUTSIDE the
  * [[DwrfWriteOptions]] case-class equality on purpose: pressure is
  * runtime state, not configuration.
  */
final class DwrfWritePressure {
  @volatile var lowMemory: Boolean = false
}

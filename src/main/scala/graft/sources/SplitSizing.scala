package graft.sources

/** Scale-adaptive split sizing for the record-format scans.
  *
  * A fixed default split size is a constant tuned for exactly one scale: at
  * cluster scale (multi-GB inputs) 64 MiB is the right granularity — the
  * reference's FileSystem-block default — but on a small input it yields a
  * SINGLE task, serializing the whole decode on one core; and the opposite
  * hand-tuned constant (the 256 KiB options the bench queries used to carry)
  * shatters a cluster-scale input into millions of map tasks whose shuffle
  * files dominate wall time (M×R block explosion, optimization guide §2.2).
  *
  * When the user gives no `splitSize` option, derive it from the input:
  * total bytes / default parallelism, clamped to [256 KiB, 64 MiB]. At
  * 100 TB the derivation saturates the 64 MiB ceiling (identical to the old
  * fixed default); at bench scale it lands near one split per core — the
  * "derive partitioning from input size, not a local-mode constant" rule.
  */
object SplitSizing {
  val MinSplit: Long = 256L * 1024
  val MaxSplit: Long = 64L * 1024 * 1024

  def derive(totalBytes: Long, parallelism: Int): Long =
    math.max(MinSplit, math.min(MaxSplit, totalBytes / math.max(1, parallelism)))
}

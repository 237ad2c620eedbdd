package graft.operators

/** Run independent Spark ACTIONS from driver threads (guide §2.6 —
  * overlap independent jobs): driver-sequenced actions each pay the full
  * job-floor latency (~25–35 ms scheduling plus commit overhead in this
  * container); submitting independent ones concurrently lets the
  * scheduler back-fill. Use ONLY for actions with no mutual dependency
  * whose shared inputs are ALREADY MATERIALIZED (cached / checkpointed
  * blocks) — racing two actions that both materialize the same lazy
  * persist can compute it twice. Rethrows the first failure after all
  * threads finish, so a crash cannot leave a thread still writing. */
private[operators] object Par {
  def run(work: Seq[() => Unit]): Unit = {
    if (work.sizeIs <= 1) { work.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = work.map(w => new Thread(() => {
      try w() catch { case t: Throwable => errs.add(t) }
    }))
    ts.foreach(_.start())
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}

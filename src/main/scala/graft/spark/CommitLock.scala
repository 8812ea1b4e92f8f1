package graft.spark

import org.apache.hadoop.fs.{Path => HPath}

/** Exclusive lock around the snapshot-commit critical section, for stores
  * whose filesystem API has NO atomically-exclusive primitive (object
  * stores: rename is copy+delete, create overwrites). On such a store the
  * manifest-CAS commit point cannot be exclusive by itself, so
  * [[GraftIo.casPromoteFile]] consults a configured CommitLock instead:
  * acquire → probe-absent + PUT → release is then a serialized
  * check-and-put, and racing appenders all land exactly as they do on
  * rename-atomic stores (this is the role Iceberg gives its catalog/
  * LockManager — HadoopCatalog alone takes the same "no safe concurrent
  * commit" position this repo took in round 5).
  *
  * Configured per table via `graft.fs.cas.lock`:
  *   - `lease` — the built-in [[FileLeaseCommitLock]], a member-file queue
  *     under `<table root>/_locks/` (reference implementation; see its
  *     correctness envelope below).
  *   - any other value — fully-qualified class name of a
  *     [[CommitLock.Provider]] with a no-arg constructor: the extension
  *     point a real deployment uses to back commits with a conditional-PUT,
  *     DynamoDB table, or ZooKeeper ensemble.
  * Unset keeps round-5 behavior: loud failure unless
  * `graft.fs.cas.unsafe=true` opts into last-writer-wins.
  */
trait CommitLock {
  /** Block until the lock is held (subject to the implementation's timeout)
    * and return the held lease. Throws on timeout — a commit MUST NOT
    * proceed un-serialized.
    */
  def acquire(): CommitLock.Lease
}

object CommitLock {

  trait Lease {
    /** Extend the lease mid-critical-section (long compactions). */
    def renew(): Unit
    /** Release the lock. Idempotent; always called (finally). */
    def release(): Unit
  }

  /** SPI for plugging an external lock service via
    * `graft.fs.cas.lock=<FQCN>`.
    */
  trait Provider {
    def create(io: GraftIo): CommitLock
  }

  /** Resolve the configured lock for a store, from the io layer's conf. */
  def forStore(io: GraftIo): Option[CommitLock] =
    Option(io.conf.getTrimmed("graft.fs.cas.lock")).filter(_.nonEmpty).map {
      case "lease" =>
        new FileLeaseCommitLock(io, new HPath(io.root, "_locks"),
          leaseMs = io.conf.getLong("graft.fs.cas.lock.lease.ms", 60000L),
          settleMs = io.conf.getLong("graft.fs.cas.lock.settle.ms", 100L),
          timeoutMs = io.conf.getLong("graft.fs.cas.lock.timeout.ms", 120000L))
      case fqcn =>
        Class.forName(fqcn).getDeclaredConstructor().newInstance()
          .asInstanceOf[Provider].create(io)
    }
}

/** Reference [[CommitLock]] needing only PUT/GET/LIST/DELETE — the object-
  * store feature floor. A queue of member OBJECTS (never an overwritable
  * shared slot): each contender PUTs its own uniquely-named member under
  * `dir` and the lexicographically-smallest live member holds the lock —
  * the ZooKeeper lock recipe re-derived over strongly-consistent listing
  * (S3 lists are strongly consistent since 2020), with member names
  * self-sequenced since no server assigns them: a contender picks its
  * timestamp AFTER listing, as `max(now, max seen + 1)`, so later arrivals
  * sort after every member they saw.
  *
  * Crash recovery: the member's CONTENT is its lease expiry; waiters renew
  * their own member each poll, holders via [[CommitLock.Lease.renew]], and
  * any contender garbage-collects expired members — a crashed holder stalls
  * the queue for at most `leaseMs`.
  *
  * Correctness envelope (why this is the REFERENCE impl, not the last
  * word): mutual exclusion holds provided every contender completes its
  * member PUT within `settleMs` of choosing the name — two contenders that
  * listed concurrently may pick inversely-ordered names, and the settle
  * pause before the first decision read is what lets each see the other. A
  * stall longer than `settleMs` between choose and PUT (a GC pause, a
  * network hiccup) can admit two holders; so can a holder stalling past its
  * own lease. Deployments that cannot tolerate that window plug a
  * conditional-PUT / DynamoDB / ZooKeeper [[CommitLock.Provider]] instead —
  * the interface, not this impl, is the contract.
  */
final class FileLeaseCommitLock(io: GraftIo, dir: HPath,
    leaseMs: Long, settleMs: Long, timeoutMs: Long) extends CommitLock {
  require(leaseMs > 0 && settleMs >= 0 && timeoutMs > 0,
    s"leaseMs=$leaseMs settleMs=$settleMs timeoutMs=$timeoutMs")

  private val pollMs = math.max(settleMs, 25L)

  // member name: zero-padded self-sequenced millis + uuid — string order IS
  // queue order, and the uuid both uniquifies and tiebreaks deterministically
  private val MemberName = """(\d{20})-[0-9a-f]{12}""".r

  import FileLeaseCommitLock.{Absent, Expiry, MemberRead, Unreadable}

  /** Read a member's lease expiry. `Absent` ONLY on FileNotFoundException —
    * the one error that PROVES the member is gone (released or GC'd). Any
    * other failure is `Unreadable` and must NOT count as vanished: a store
    * 500/throttle on the live HOLDER's member would otherwise let a waiter
    * filter the holder out of the queue and acquire while the lock was held
    * — the exact lost-commit this lock exists to prevent (round-6 review).
    * Unparseable content is also `Unreadable`, not corrupt-therefore-dead:
    * on create-then-chmod local stores a freshly-PUT member reads EMPTY
    * mid-write, and an immediate GC races the creator's own write (observed
    * as a chmod-on-deleted-file failure in the latch test). The caller
    * grants unreadable members a full lease of grace before reclaiming.
    */
  private def expiryOf(p: HPath): MemberRead =
    try Expiry(io.readString(p).trim.toLong)
    catch {
      case _: java.io.FileNotFoundException => Absent
      case _: java.io.IOException | _: NumberFormatException => Unreadable
    }

  private def memberNames(): Seq[String] =
    io.list(dir).collect {
      case st if st.isFile && MemberName.pattern.matcher(st.getPath.getName).matches =>
        st.getPath.getName
    }.sorted

  def acquire(): CommitLock.Lease = {
    io.mkdirs(dir)
    val deadline = System.currentTimeMillis() + timeoutMs
    // outer loop: one iteration per enqueued member; re-entered only if our
    // member was GC'd from under us (we stalled past our own lease)
    while (true) {
      // deadline applies to the REQUEUE path too: with settleMs >= leaseMs
      // every waiter expires between its own renewals and contenders GC each
      // other perpetually — without this check that misconfiguration looped
      // forever instead of surfacing as a timeout (round-6 review)
      if (System.currentTimeMillis() > deadline)
        sys.error(s"commit lock timeout after ${timeoutMs}ms re-enqueuing on " +
          s"$dir — our member kept expiring before reaching the queue head; " +
          s"is graft.fs.cas.lock.settle.ms ($settleMs) too close to " +
          s"lease.ms ($leaseMs)?")
      val seen = memberNames()
      val maxSeen = seen.flatMap {
        case MemberName(ts) => Some(ts.toLong)
        case _ => None
      }.maxOption.getOrElse(0L)
      val ts = math.max(System.currentTimeMillis(), maxSeen + 1)
      val name = f"$ts%020d-" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val my = new HPath(dir, name)
      io.writeDirect(my, (System.currentTimeMillis() + leaseMs).toString)
      if (settleMs > 0) Thread.sleep(settleMs)
      var requeue = false
      // first-unreadable timestamps, scoped to this acquire: an unreadable
      // member (mid-write on create-then-chmod stores, or a store error on
      // a live holder) stays live for a full lease before it is reclaimed —
      // a real contender becomes readable within settleMs, so only a write
      // that crashed mid-PUT (or a store outage as long as a crashed
      // holder's) ever ages out
      val unreadableSince = scala.collection.mutable.Map.empty[String, Long]
      while (!requeue) {
        val now = System.currentTimeMillis()
        val live = memberNames().filter { n =>
          if (n == name) true
          else expiryOf(new HPath(dir, n)) match {
            case Expiry(e) if e >= now => unreadableSince.remove(n); true
            case Expiry(_) => io.delete(new HPath(dir, n)); false // expired: GC
            case Absent => false // vanished between list and read
            case Unreadable =>
              if (now - unreadableSince.getOrElseUpdate(n, now) > leaseMs) {
                io.delete(new HPath(dir, n)); false // crashed mid-PUT: GC
              } else true
          }
        }
        if (!live.contains(name)) requeue = true // GC'd by a peer: re-enqueue
        else if (live.head == name) return new LeaseImpl(my)
        else if (System.currentTimeMillis() > deadline) {
          io.delete(my)
          sys.error(s"commit lock timeout after ${timeoutMs}ms waiting on " +
            s"$dir (head of queue: ${live.head}) — a crashed holder expires " +
            s"after ${leaseMs}ms; raise graft.fs.cas.lock.timeout.ms if " +
            "commits legitimately take longer")
        } else {
          // stay live in the queue while waiting
          io.writeDirect(my, (System.currentTimeMillis() + leaseMs).toString)
          Thread.sleep(pollMs)
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private final class LeaseImpl(my: HPath) extends CommitLock.Lease {
    def renew(): Unit =
      io.writeDirect(my, (System.currentTimeMillis() + leaseMs).toString)
    def release(): Unit = { io.delete(my): Unit }
  }
}

private object FileLeaseCommitLock {
  sealed trait MemberRead
  case object Absent extends MemberRead
  final case class Expiry(ms: Long) extends MemberRead
  case object Unreadable extends MemberRead
}

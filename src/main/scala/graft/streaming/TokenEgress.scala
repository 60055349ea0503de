package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE per-token egress (SURVEY.md §2.H S-1; reference WS relay loop
  * app/main.py:616-647, client concat :717-727): the reference streams
  * answer tokens over a WebSocket strictly in `seq` order, and the
  * client appends each delta as it arrives.
  *
  * [[StreamingOps.assembleTokens]] is the batch twin (whole answers per
  * micro-batch). This operator is the live twin: a keyed stateful op
  * that RELAYS tokens downstream as soon as they become contiguous —
  * out-of-order arrivals wait in per-answer state, and the moment the
  * gap fills, the whole ready run is emitted in order. Emission order
  * within one answer is exactly seq order across any arrival shuffle
  * and any micro-batch boundary placement.
  *
  * Scale/state posture: per-answer state is (next_seq, buffered gap
  * tokens) — bounded by `maxBuffer` (a hole can only hold so many
  * successors; beyond that the input contract is broken and the task
  * fails loudly rather than growing state without bound). Answers are
  * KB-sized by contract (reference answers are LLM outputs), so state
  * is O(open answers × maxBuffer) under RocksDB.
  */
object TokenEgress {

  case class TokenIn(answer_id: Long, seq: Long, token: String)
  case class TokenOut(answer_id: Long, seq: Long, token: String)
  /** `buffered` holds tokens whose predecessors have not arrived yet,
    * keyed by seq; `next_seq` is the first seq not yet emitted. */
  case class EgressState(next_seq: Long, buffered: Map[Long, String])

  val DefaultMaxBuffer = 4096

  /** Fold one micro-batch of tokens for one answer: stash arrivals,
    * then drain the contiguous run starting at next_seq. Duplicate or
    * already-emitted seqs (at-least-once sources) are dropped — the
    * first arrival wins, matching the WS loop's exactly-once send. */
  def relay(maxBuffer: Int)(
      answerId: Long,
      tokens: Iterator[TokenIn],
      state: GroupState[EgressState]): Iterator[TokenOut] = {
    val prior = state.getOption.getOrElse(EgressState(0L, Map.empty))
    var buf = prior.buffered
    tokens.foreach { t =>
      if (t.seq >= prior.next_seq && !buf.contains(t.seq)) buf += t.seq -> t.token
    }
    val out = Seq.newBuilder[TokenOut]
    var next = prior.next_seq
    while (buf.contains(next)) {
      out += TokenOut(answerId, next, buf(next))
      buf -= next
      next += 1
    }
    // Enforce the bound only on what remains gap-blocked AFTER draining:
    // a fully in-order group of any length passes (it drains to empty);
    // only a genuine hole with > maxBuffer stranded successors fails.
    require(buf.size <= maxBuffer,
      s"token egress: answer $answerId buffers ${buf.size} out-of-order tokens " +
        s"(> $maxBuffer) — upstream is not delivering seq $next")
    state.update(EgressState(next, buf))
    out.result().iterator
  }

  /** Wire the relay over a (streaming or batch) Dataset. Streaming
    * callers use Append output mode — each emitted token is final. */
  def tokenEgress(tokens: Dataset[TokenIn],
                  maxBuffer: Int = DefaultMaxBuffer): Dataset[TokenOut] = {
    implicit val stateEnc = Encoders.product[EgressState]
    implicit val outEnc = Encoders.product[TokenOut]
    tokens
      .groupByKey(_.answer_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        relay(maxBuffer))
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ChatTurn

/** Per-chat conversation memory as keyed streaming state (SURVEY.md §2.H
  * S-2; reference `ConversationBufferMemory` keyed by chat_id,
  * app/main.py:483-489,543-544).
  *
  * The reference's buffer is unbounded (and `memory_store` is never
  * initialized — a crash we deliberately do not replicate, SURVEY §7.5);
  * we bound state to `maxTurns` per chat so state size stays O(chats ×
  * maxTurns) under RocksDB at scale.
  */
object SessionState {

  /** `seq` orders messages within a micro-batch: the Iterator order that
    * mapGroupsWithState hands a group is not guaranteed chronological, so
    * callers stamp an event sequence (or timestamp) and updateChat sorts
    * by it. The default 0 keeps single-message batches unaffected (the
    * sort is stable). */
  case class ChatMessage(chat_id: String, input: String, output: String, seq: Long = 0L)
  case class ChatState(turns: Seq[ChatTurn])
  case class ChatHistory(chat_id: String, history: String, n_turns: Int)

  val DefaultMaxTurns = 50

  /** Fold new turns into per-chat state; emit the rendered history string
    * the prompt builder prepends (app/main.py:515-516 shape). */
  def updateChat(maxTurns: Int)(
      chatId: String,
      messages: Iterator[ChatMessage],
      state: GroupState[ChatState]): ChatHistory = {
    val prior = state.getOption.map(_.turns).getOrElse(Seq.empty)
    // number from the last retained turn, NOT prior.size — once bounding
    // truncates, size would restart and collide with retained turn ids
    val start = prior.lastOption.map(_.turn + 1).getOrElse(0)
    // stable sort by seq: deterministic chronological fold even when one
    // micro-batch delivers several messages for the same chat
    val ordered = messages.toIndexedSeq.sortBy(_.seq)
    val appended = prior ++ ordered.zipWithIndex.map { case (m, i) =>
      ChatTurn(chatId, m.input, m.output, start + i)
    }
    val bounded = appended.takeRight(maxTurns)
    state.update(ChatState(bounded))
    val rendered = bounded
      .map(t => s"Human: ${t.input}\nAI: ${t.output}")
      .mkString("\n")
    ChatHistory(chatId, rendered, bounded.size)
  }

  /** Wire the state function over a (streaming or batch) Dataset. */
  def chatMemory(messages: Dataset[ChatMessage],
                 maxTurns: Int = DefaultMaxTurns): Dataset[ChatHistory] = {
    implicit val stateEnc = Encoders.product[ChatState]
    implicit val histEnc = Encoders.product[ChatHistory]
    messages
      .groupByKey(_.chat_id)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateChat(maxTurns))
  }
}

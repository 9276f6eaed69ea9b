package graft.api

/** A group of values with a key, produced by [[DataBag.groupBy]] /
  * [[DataBag.foldGroup]]. Mirrors the reference's
  * `Group[K, +V]` (emma-language api/Group.scala:19). */
case class Group[K, +V](key: K, values: V)

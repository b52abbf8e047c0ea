package graft.queries
import graft.QDef
object EventQueries { val defs: Seq[QDef] = Seq() }

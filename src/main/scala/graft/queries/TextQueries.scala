package graft.queries
import graft.QDef
object TextQueries { val defs: Seq[QDef] = Seq() }
